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
            from .fused_block import _gelu_fast

            out = _gelu_fast(out)
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
    Every dimension is zero-padded to its block multiple and the result
    sliced back (the same ragged-tile handling as the reference GEMM,
    ll.cl:37-51) — e.g. the 1000-class classifier head pads N to 1024.
    """
    *lead, k_dim = x.shape
    m = int(np.prod(lead)) if lead else 1
    n_dim = w.shape[1]
    out_dtype = x.dtype

    block_m = min(block_m, _cdiv(m, 8) * 8 if m < block_m else block_m)
    block_n = min(block_n, _cdiv(n_dim, 128) * 128)
    block_k = min(block_k, _cdiv(k_dim, 128) * 128)

    x2 = x.reshape(m, k_dim)
    m_pad = _cdiv(m, block_m) * block_m
    k_pad = _cdiv(k_dim, block_k) * block_k
    n_pad = _cdiv(n_dim, block_n) * block_n
    if m_pad != m or k_pad != k_dim:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - k_dim)))
    if k_pad != k_dim or n_pad != n_dim:
        w = jnp.pad(w, ((0, k_pad - k_dim), (0, n_pad - n_dim)))
    if b is None:
        b = jnp.zeros((n_dim,), jnp.float32)
    if n_pad != n_dim:
        b = jnp.pad(b, (0, n_pad - n_dim))
    b2 = jnp.broadcast_to(b.reshape(1, n_pad), (1, n_pad))
    k_dim, n_dim_out = k_pad, n_dim
    n_dim = n_pad

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

    if m_pad != m or n_dim_out != n_dim:
        out = out[:m, :n_dim_out]
    return out.reshape(*lead, n_dim_out)
