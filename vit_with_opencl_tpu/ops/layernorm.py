"""LayerNorm (+ optional fused residual add) — Pallas kernel.

TPU-native replacement for the reference's ``layerNorm`` kernel
(reference: layer_norm.cl:3-53 — strided partial sums of x and x², tree
reduction in local memory, var = E[x²]−E[x]², eps=1e-6) and its separate
``encoderResidual`` elementwise-add kernel (layer_norm.cl:55-65). Here one
grid cell normalizes a whole block of tokens with the feature axis resident
in VMEM — no cross-workgroup redundancy (the reference launches 3 workgroups
per token that each recompute the same statistics, ViT_opencl.c:464-465) —
and the preceding residual add can be fused in, eliminating one HBM round
trip per encoder block.

Statistics are computed in fp32 regardless of input dtype, matching the
golden model (models/golden.layer_norm) and the 1e-3 parity budget.
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


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [block_t, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean_sq = jnp.mean(x * x, axis=-1, keepdims=True)
    var = mean_sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    w = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    o_ref[...] = ((x - mean) * inv * w + b).astype(o_ref.dtype)


def _ln_residual_kernel(x_ref, r_ref, w_ref, b_ref, o_ref, res_ref, *, eps: float):
    s = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    res_ref[...] = s.astype(res_ref.dtype)
    mean = jnp.mean(s, axis=-1, keepdims=True)
    mean_sq = jnp.mean(s * s, axis=-1, keepdims=True)
    var = mean_sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    w = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    o_ref[...] = ((s - mean) * inv * w + b).astype(o_ref.dtype)


def layer_norm(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    eps: float = 1e-6,
    *,
    block_t: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Per-token LayerNorm over the last axis. x: [..., T, D] → same shape."""
    *lead, d = x.shape
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, d)
    block_t = min(block_t, _cdiv(m, 8) * 8)
    m_pad = _cdiv(m, block_t) * block_t
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(m_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, w.reshape(1, d), b.reshape(1, d))

    if m_pad != m:
        out = out[:m]
    return out.reshape(*lead, d)


def residual_layer_norm(
    x: jax.Array,
    residual: jax.Array,
    w: jax.Array,
    b: jax.Array,
    eps: float = 1e-6,
    *,
    block_t: int = 256,
    interpret: bool = False,
):
    """(x + residual) then LayerNorm, one pass.

    Returns ``(normalized, summed)`` — the summed activations feed the next
    residual connection. Fuses the reference's ``encoderResidual`` +
    ``layerNorm`` pair (layer_norm.cl:55-65, 3-53) into one HBM pass.
    """
    *lead, d = x.shape
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, d)
    r2 = residual.reshape(m, d)
    block_t = min(block_t, _cdiv(m, 8) * 8)
    m_pad = _cdiv(m, block_t) * block_t
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        r2 = jnp.pad(r2, ((0, m_pad - m), (0, 0)))

    out, summed = pl.pallas_call(
        functools.partial(_ln_residual_kernel, eps=eps),
        grid=(m_pad // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, d), lambda i: (i, 0)),
            pl.BlockSpec((block_t, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_t, d), lambda i: (i, 0)),
            pl.BlockSpec((block_t, d), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, d), x.dtype),
            jax.ShapeDtypeStruct((m_pad, d), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, r2, w.reshape(1, d), b.reshape(1, d))

    if m_pad != m:
        out, summed = out[:m], summed[:m]
    return out.reshape(*lead, d), summed.reshape(*lead, d)
