"""Fused linear layer — Pallas tiled GEMM with bias + optional erf-GELU epilogue.

TPU-native equivalent of the reference's single GEMM primitive ``linear_layer``
(reference: ll.cl:7-86): an 8x8 local-memory-tiled ``x @ W^T + b`` with an
optional fused exact-erf GELU (ll.cl:3-5,66-69) used for MLP fc1 (GELU on),
fc2, the attention out-projection and the classifier head. Here the tiling is
MXU-shaped ((128, 128) output tiles, fp32 VMEM accumulator across the K grid
dimension) and the epilogue (bias add, GELU) runs in fp32 on the final K step
— the reference's zero-padding of ragged tiles (ll.cl:37-51) becomes wrapper-
level padding of the row dimension.

XLA already fuses bias/GELU into its own GEMMs; this kernel exists so the
framework owns its hot GEMM path end-to-end and as the tuning point for
shapes XLA schedules poorly. The kernel table (models/vit.resolve_kernels)
selects between them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _linear_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, num_k: int,
                   fuse_gelu: bool):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == num_k - 1)
    def _epilogue():
        out = acc_ref[...] + b_ref[...].astype(jnp.float32)
        if fuse_gelu:
            out = 0.5 * out * (1.0 + jax.lax.erf(out * np.float32(1 / np.sqrt(2.0))))
        o_ref[...] = out.astype(o_ref.dtype)


def fused_linear(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    fuse_gelu: bool = False,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x @ w (+ b)`` with optional erf-GELU epilogue.

    x: [..., K] (leading dims flattened to M), w: [K, N] (right-multiply
    layout — the io layer already transposes PyTorch's [out, in]), b: [N].
    M is padded to the tile size; K and N must divide their block sizes
    (all reference shapes are multiples of 128; block sizes auto-shrink).
    """
    *lead, k_dim = x.shape
    m = int(np.prod(lead)) if lead else 1
    n_dim = w.shape[1]
    out_dtype = x.dtype

    block_m = min(block_m, _cdiv(m, 8) * 8 if m < block_m else block_m)
    block_n = min(block_n, n_dim)
    block_k = min(block_k, k_dim)
    if k_dim % block_k or n_dim % block_n:
        raise ValueError(
            f"K={k_dim} and N={n_dim} must be multiples of block sizes "
            f"({block_k}, {block_n})"
        )

    x2 = x.reshape(m, k_dim)
    m_pad = _cdiv(m, block_m) * block_m
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    if b is None:
        b = jnp.zeros((n_dim,), jnp.float32)
    b2 = jnp.broadcast_to(b.reshape(1, n_dim), (1, n_dim))

    num_k = k_dim // block_k
    kernel = functools.partial(_linear_kernel, num_k=num_k, fuse_gelu=fuse_gelu)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m, n_dim // block_n, num_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_dim), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_dim * k_dim,
            bytes_accessed=(m_pad * k_dim + k_dim * n_dim + m_pad * n_dim)
            * x.dtype.itemsize,
            transcendentals=m_pad * n_dim if fuse_gelu else 0,
        ),
        interpret=interpret,
    )(x2, w, b2)

    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, n_dim)
