"""Fused multi-head attention — Pallas flash kernel with online softmax.

This is the TPU-native replacement for the reference's fused attention kernel
``QKV_TO_SCOREV`` (reference: multihead.cl:65-138), which computes
softmax(QK^T/sqrt(d))V per (token, head) in one workgroup without writing the
score matrix to global memory — but hard-assumes seq <= 256 (its local arrays,
multihead.cl:81-83). This kernel keeps the fused single-pass structure and
removes the cap: K/V are tiled over a grid dimension and the softmax is
computed online (running max/sum with rescaling), so any sequence length
works — 197 tokens for @224 models, 577 for ViT-L @384, and beyond.

Layout notes: inputs are [B, H, T, hd]. The kernel runs on a
(B*H, T/block_q, T_kv/block_k) grid; softmax statistics and the output
accumulator live in fp32 VMEM scratch that persists across the KV grid
dimension. Ragged sequence tails (197 is not a multiple of any MXU tile) are
handled by padding to the block size and masking padded KV columns to a large
negative value — the same zero-pad-the-tail idea as the reference's GEMM
(ll.cl:37-51), done with masks instead of branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ViTConfig

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
# -inf would produce NaN via exp(-inf - (-inf)) on fully-masked rows.
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
    scale: float, seq_len: int, block_k: int, num_kv_blocks: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, hd]
    k = k_ref[0]  # [block_k, hd]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]
    s = s * scale

    # Mask KV positions past the true sequence length (padded tail).
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < seq_len, s, MASK_VALUE)

    m_prev = m_ref[:, 0:1]  # [block_q, 1]
    l_prev = l_ref[:, 0:1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)  # [block_q, block_k]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    v = v_ref[0]  # [block_k, hd]
    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )  # [block_q, hd]
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _emit():
        l_final = l_ref[:, 0:1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    config: ViTConfig,
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
) -> jax.Array:
    """softmax(QK^T / sqrt(hd)) V, fused. Inputs [B, H, T, hd] → [B, H, T, hd].

    Drop-in for ``models.vit.xla_attention`` (same kernel-table slot).
    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, hd = q.shape
    scale = float(1.0 / np.sqrt(config.head_dim))

    t_pad = _cdiv(t, max(block_q, block_k)) * max(block_q, block_k)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(b * h, t_pad, hd)
    kf = k.reshape(b * h, t_pad, hd)
    vf = v.reshape(b * h, t_pad, hd)

    # The kernel masks KV columns >= seq_len; bake the true length in.
    n = b * h
    num_q_blocks = t_pad // block_q
    num_kv_blocks = t_pad // block_k
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        seq_len=t,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * t_pad * t_pad * hd,
            bytes_accessed=3 * n * t_pad * hd * q.dtype.itemsize
            + n * t_pad * hd * q.dtype.itemsize,
            transcendentals=n * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out.reshape(b, h, t_pad, hd)
    return out[:, :, :t] if t_pad != t else out


def flash_attention_interpret(q, k, v, config):
    """Interpreter-mode variant for CPU tests."""
    return flash_attention(q, k, v, config, interpret=True)
