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
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ViTConfig

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
# Ragged (unpadded) packed-attention blocks beat padded ones at @224 scale,
# but Mosaic's relayout buffers for misaligned rows blow scoped VMEM once the
# block is big; route by block size. Autotunable: perf/autotune measures the
# actual crossover per (config, batch) and overrides via the kernels table.
RAGGED_MAX_BLOCK_BYTES = 2 << 20
# -inf would produce NaN via exp(-inf - (-inf)) on fully-masked rows.
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_LANES = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _head_attention(q, k, v, scale, neg=None):
    """One head's softmax(q·scale @ kᵀ) @ v with whole-row softmax in fp32.

    Shared by every single-pass kernel (packed, split-head, fused block, and
    the backward's recompute) so the numerics can't drift. Scaling is applied
    to q (T×hd muls, not T²); ``neg`` is an optional additive [T, T] mask;
    normalization scales the (T×hd) output, not the (T²) weights. Returns
    (output fp32 [T, hd], probabilities fp32 [T, T]).
    """
    qs = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if neg is not None:
        s = s + neg
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    inv = 1.0 / jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return o * inv, e * inv


def _packed_offsets(packing: str, h: int, num_heads: int, head_dim: int):
    """Static q/k/v column offsets for head ``h`` in a packed qkv buffer."""
    d = num_heads * head_dim
    if packing == "slab":
        # q|k|v slabs of D each, head-major within (the reference's packed
        # QKV buffer layout, multihead.cl:21-22).
        return h * head_dim, d + h * head_dim, 2 * d + h * head_dim
    # "per_head": [h0:(q|k|v), h1:(q|k|v), ...] — the TP layout.
    qo = h * 3 * head_dim
    return qo, qo + head_dim, qo + 2 * head_dim


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
    scale: float, seq_len: int, block_k: int, num_kv_blocks: int,
    lse_ref=None,
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
        if lse_ref is not None:
            # Per-row softmax log-normalizer, the only residual the blockwise
            # backward needs beyond q/k/v/o (p = exp(s - lse) reconstructs
            # the probabilities tile-by-tile).
            l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
            lse_ref[0] = (m_ref[:, 0:1] + jnp.log(l_safe))[:, 0]


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                      acc_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  lse_ref=lse_ref, **kw)


def _single_pass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        seq_len: int, heads_per_cell: int):
    """Whole-sequence fused attention: K/V for the full (padded) sequence are
    VMEM-resident, so softmax is one shot — no online statistics. Several
    heads per grid cell amortize grid overhead (hd=64 keeps each matmul
    half-depth on the MXU, so per-head work is small)."""
    t_pad = q_ref.shape[1]
    neg = None
    if t_pad != seq_len:
        col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 1)
        neg = jnp.where(col < seq_len, 0.0, MASK_VALUE).astype(jnp.float32)
    for i in range(heads_per_cell):
        o, _ = _head_attention(q_ref[i], k_ref[i], v_ref[i], scale, neg)
        o_ref[i] = o.astype(o_ref.dtype)


# Above this (padded) sequence length, whole-KV-in-VMEM stops being a good
# idea and the kernel switches to the online-softmax blockwise path.
SINGLE_PASS_MAX_T = 1024


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
    (CPU tests). Two regimes:

      * short sequences (padded T <= SINGLE_PASS_MAX_T): single-pass kernel,
        whole K/V in VMEM, one-shot softmax, several heads per grid cell;
      * long sequences: blockwise online-softmax (classic flash), unbounded T.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, t, hd = q.shape
    if t <= SINGLE_PASS_MAX_T:
        return _single_pass_attention(q, k, v, config, interpret=interpret)
    return _blockwise_attention(
        q, k, v, config, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _single_pass_attention(q, k, v, config, *, interpret=False,
                           heads_per_cell: int | None = None):
    b, h, t, hd = q.shape
    scale = float(1.0 / np.sqrt(config.head_dim))
    t_pad = max(_cdiv(t, 128) * 128, 128)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    n = b * h
    if heads_per_cell is None:
        # Budget ~2 MB of VMEM for the scores tile per cell.
        heads_per_cell = max(1, min(8, n, (2 << 20) // (t_pad * t_pad * 4)))
    while n % heads_per_cell:
        heads_per_cell -= 1
    qf = q.reshape(n, t_pad, hd)
    kf = k.reshape(n, t_pad, hd)
    vf = v.reshape(n, t_pad, hd)
    kernel = functools.partial(
        _single_pass_kernel, scale=scale, seq_len=t,
        heads_per_cell=heads_per_cell,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // heads_per_cell,),
        in_specs=[
            pl.BlockSpec((heads_per_cell, t_pad, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((heads_per_cell, t_pad, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((heads_per_cell, t_pad, hd), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((heads_per_cell, t_pad, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * t_pad * t_pad * hd,
            bytes_accessed=4 * n * t_pad * hd * q.dtype.itemsize,
            transcendentals=n * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, t_pad, hd)
    return out[:, :, :t] if t_pad != t else out


def _blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    config: ViTConfig,
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    b, h, t, hd = q.shape
    scale = float(1.0 / np.sqrt(config.head_dim))

    lcm = block_q * block_k // math.gcd(block_q, block_k)
    t_pad = _cdiv(t, lcm) * lcm
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    qf = q.reshape(b * h, t_pad, hd)
    kf = k.reshape(b * h, t_pad, hd)
    vf = v.reshape(b * h, t_pad, hd)

    out, _ = _blockwise_fwd_flat(
        qf, kf, vf, scale=scale, seq_len=t, block_q=block_q, block_k=block_k,
        interpret=interpret, return_lse=False,
    )
    out = out.reshape(b, h, t_pad, hd)
    return out[:, :, :t] if t_pad != t else out


def _blockwise_fwd_flat(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    *,
    scale: float,
    seq_len: int,
    block_q: int,
    block_k: int,
    interpret: bool,
    return_lse: bool,
):
    """Blockwise flash forward on flat, pre-padded [n, t_pad, hd] inputs.

    Returns (out [n, t_pad, hd], lse [n, t_pad] f32 or None). The kernel
    masks KV columns >= seq_len (padded tail)."""
    n, t_pad, hd = qf.shape
    num_q_blocks = t_pad // block_q
    num_kv_blocks = t_pad // block_k
    kw = dict(scale=scale, seq_len=seq_len, block_k=block_k,
              num_kv_blocks=num_kv_blocks)
    qspec = pl.BlockSpec((1, block_q, hd), lambda bi, qi, ki: (bi, qi, 0))
    kspec = pl.BlockSpec((1, block_k, hd), lambda bi, qi, ki: (bi, ki, 0))
    out_shape = jax.ShapeDtypeStruct((n, t_pad, hd), qf.dtype)
    if return_lse:
        kernel = functools.partial(_flash_kernel_lse, **kw)
        out_specs = [qspec, pl.BlockSpec((1, block_q),
                                         lambda bi, qi, ki: (bi, qi))]
        out_shapes = [out_shape,
                      jax.ShapeDtypeStruct((n, t_pad), jnp.float32)]
    else:
        kernel = functools.partial(_flash_kernel, **kw)
        out_specs = qspec
        out_shapes = out_shape
    result = pl.pallas_call(
        kernel,
        grid=(n, num_q_blocks, num_kv_blocks),
        in_specs=[qspec, kspec, kspec],
        out_specs=out_specs,
        out_shape=out_shapes,
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
            bytes_accessed=3 * n * t_pad * hd * qf.dtype.itemsize
            + n * t_pad * hd * qf.dtype.itemsize,
            transcendentals=n * t_pad * t_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    if return_lse:
        return result[0], result[1]
    return result, None


def flash_attention_interpret(q, k, v, config):
    """Interpreter-mode variant for CPU tests."""
    return flash_attention(q, k, v, config, interpret=True)


# ---------------------------------------------------------------------------
# Carry-in/carry-out blockwise forward — the ring-attention local step.
#
# Ring attention (ops/ring_attention.py) maintains online-softmax statistics
# ACROSS devices while KV shards rotate. Its local step is exactly a
# blockwise flash forward whose (m, l, acc) start from the previous
# rotation's values instead of (-inf, 0, 0) and are emitted un-normalized.
# With this kernel nothing [T_loc, T_loc]-shaped ever reaches HBM inside the
# ring either — the einsum local step materialized the full local score
# matrix, undercutting the long-context positioning.
# ---------------------------------------------------------------------------


def _flash_carry_kernel(
    q_ref, k_ref, v_ref, bias_ref, m_in_ref, l_in_ref, acc_in_ref,
    m_out_ref, l_out_ref, acc_out_ref, m_ref, l_ref, acc_ref, *,
    scale: float, num_kv_blocks: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.broadcast_to(m_in_ref[0][:, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_in_ref[0][:, None], l_ref.shape)
        acc_ref[...] = acc_in_ref[0]

    q = q_ref[0]  # [block_q, hd]
    k = k_ref[0]  # [block_k, hd]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    # Additive per-KV-position bias: 0 for live positions, MASK_VALUE for
    # ring padding. Computed OUTSIDE (the source-shard index is traced).
    s = s + bias_ref[0][None, :]

    m_prev = m_ref[:, 0:1]
    l_prev = l_ref[:, 0:1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
    v = v_ref[0]
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _emit():
        m_out_ref[0] = m_ref[:, 0]
        l_out_ref[0] = l_ref[:, 0]
        acc_out_ref[0] = acc_ref[...]


def blockwise_ring_step(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    kv_bias: jax.Array,
    m: jax.Array,
    l: jax.Array,
    acc: jax.Array,
    *,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool | None = None,
):
    """One ring rotation's local attention, blockwise with carried stats.

    qf/kf/vf: [n, t_loc, hd]; kv_bias: [1, t_loc] fp32 additive mask;
    m/l: [n, t_loc] fp32; acc: [n, t_loc, hd] fp32. Returns updated
    (m, l, acc) — un-normalized; divide acc by l after the last rotation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t_loc, hd = qf.shape
    assert t_loc % block_q == 0 and t_loc % block_k == 0, (t_loc, block_q,
                                                          block_k)
    kernel = functools.partial(
        _flash_carry_kernel, scale=scale, num_kv_blocks=t_loc // block_k,
    )
    qspec = pl.BlockSpec((1, block_q, hd), lambda bi, qi, ki: (bi, qi, 0))
    kspec = pl.BlockSpec((1, block_k, hd), lambda bi, qi, ki: (bi, ki, 0))
    mspec = pl.BlockSpec((1, block_q), lambda bi, qi, ki: (bi, qi))
    bspec = pl.BlockSpec((1, block_k), lambda bi, qi, ki: (0, ki))
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(n, t_loc // block_q, t_loc // block_k),
        in_specs=[qspec, kspec, kspec, bspec, mspec, mspec, qspec],
        out_specs=[mspec, mspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((n, t_loc), f32),
            jax.ShapeDtypeStruct((n, t_loc), f32),
            jax.ShapeDtypeStruct((n, t_loc, hd), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), f32),
            pltpu.VMEM((block_q, _LANES), f32),
            pltpu.VMEM((block_q, hd), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, kv_bias, m, l, acc)


# ---------------------------------------------------------------------------
# Differentiable packed attention (custom VJP, Pallas forward AND backward)
# ---------------------------------------------------------------------------
#
# Pallas kernels have no automatic gradient. The backward is its own fused
# kernel using flash-attention-style rematerialization: only the qkv input is
# saved as a residual; the kernel recomputes the softmax per head and applies
#   dP = dO Vᵀ;  dV = Pᵀ dO;  dS = P ⊙ (dP − rowsum(dP ⊙ P))
#   dQ = scale · dS K;  dK = scale · dSᵀ Q
# so nothing [T, T]-shaped ever reaches HBM in either direction.


def _packed_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale: float,
                       seq_len: int, num_heads: int, head_dim: int,
                       images_per_cell: int):
    t_in = qkv_ref.shape[1]
    neg = None
    if t_in != seq_len:
        # Padded route: mask the zero-padded KV tail in the recompute, same
        # as the forward (padded dO rows are zero, so they contribute no
        # gradient of their own).
        col = jax.lax.broadcasted_iota(jnp.int32, (t_in, t_in), 1)
        neg = jnp.where(col < seq_len, 0.0, MASK_VALUE).astype(jnp.float32)
    for img in range(images_per_cell):
        qkv = qkv_ref[img]  # [T, 3D]
        do = do_ref[img]  # [T, D]
        for h in range(num_heads):
            qo, ko, vo = _packed_offsets("slab", h, num_heads, head_dim)
            q = qkv[:, qo:qo + head_dim]
            k = qkv[:, ko:ko + head_dim]
            v = qkv[:, vo:vo + head_dim]
            doh = do[:, h * head_dim:(h + 1) * head_dim]
            # Recompute the softmax (cheaper than storing [T, T] residuals).
            _, p = _head_attention(q, k, v, scale, neg)
            # dP = dO @ V^T
            dp = jax.lax.dot_general(
                doh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dS = P * (dP - rowsum(dP * P))
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            ds = (ds * scale).astype(qkv.dtype)
            # dV = P^T @ dO
            dv = jax.lax.dot_general(
                p.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq = jax.lax.dot(ds, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dqkv_ref[img, :, qo:qo + head_dim] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[img, :, ko:ko + head_dim] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[img, :, vo:vo + head_dim] = dv.astype(dqkv_ref.dtype)


def packed_attention_bwd(
    qkv: jax.Array,
    do: jax.Array,
    num_heads: int,
    head_dim: int,
    *,
    images_per_cell: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused backward: (qkv [B,T,3D], dO [B,T,D]) → dqkv [B,T,3D].

    ``images_per_cell`` widens the grid cell like the forward's knob (an
    autotune target: few-head models amortize per-cell overhead across
    images). Default 1 — the backward's working set is ~2.3x the forward's
    (qkv + dO in, dqkv out, plus the rematerialized [T, T] per head), so
    the forward's heuristic does not transfer.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_d = qkv.shape
    d = num_heads * head_dim
    assert three_d == 3 * d
    scale = float(1.0 / np.sqrt(head_dim))
    if images_per_cell is None:
        images_per_cell = 1
    images_per_cell = int(max(1, min(images_per_cell, b)))
    while b % images_per_cell:
        images_per_cell -= 1
    # Same ragged-vs-padded routing as the forward: big misaligned blocks
    # blow Mosaic's ragged relayout VMEM (see packed_fused_attention).
    t_in = t
    if images_per_cell * t * 3 * d * qkv.dtype.itemsize > (2 << 20):
        t_in = max(_cdiv(t, 128) * 128, 128)
        if t_in != t:
            qkv = jnp.pad(qkv, ((0, 0), (0, t_in - t), (0, 0)))
            do = jnp.pad(do, ((0, 0), (0, t_in - t), (0, 0)))
    kernel = functools.partial(
        _packed_bwd_kernel, scale=scale, seq_len=t, num_heads=num_heads,
        head_dim=head_dim, images_per_cell=images_per_cell,
    )
    ipc = images_per_cell
    out = pl.pallas_call(
        kernel,
        grid=(b // ipc,),
        in_specs=[
            pl.BlockSpec((ipc, t_in, 3 * d), lambda i: (i, 0, 0)),
            pl.BlockSpec((ipc, t_in, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((ipc, t_in, 3 * d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_in, 3 * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=32 << 20,
        ),
        interpret=interpret,
    )(qkv, do)
    return out[:, :t] if t_in != t else out


# ---------------------------------------------------------------------------
# Blockwise (long-sequence) attention backward — true flash backward.
#
# The packed backward above rematerializes the whole [T, T] probability
# matrix per head in VMEM, which caps trainable sequence length around the
# single-pass regime. These kernels remove that cap: like the forward, they
# tile the KV (resp. Q) axis over the grid and reconstruct probabilities one
# [block_q, block_k] tile at a time from the forward's saved log-sum-exp, so
# VMEM holds only O(block_q * block_k) scores regardless of T. This finishes
# the removal of the reference's seq<=256 local-array cap
# (multihead.cl:81-83) for TRAINING, not just inference.
#
#   p  = exp(q kᵀ · scale − lse)            (tile recompute)
#   dv = Σ_q pᵀ dO                          (accumulated over q tiles)
#   dp = dO vᵀ;  ds = p ⊙ (dp − D) · scale  (D = rowsum(dO ⊙ O), precomputed)
#   dq = Σ_kv ds k;   dk = Σ_q dsᵀ q
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dq_ref, acc_ref, *,
    scale: float, seq_len: int, block_k: int, num_kv_blocks: int,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < seq_len, s, MASK_VALUE)
    p = jnp.exp(s - lse_ref[0][:, None])  # masked cols underflow to 0
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    ds = (p * (dp - dvec_ref[0][:, None]) * scale).astype(k.dtype)
    acc_ref[...] += jax.lax.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _emit():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *,
    scale: float, seq_len: int, block_k: int, num_q_blocks: int,
):
    kv_idx = pl.program_id(1)
    q_idx = pl.program_id(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < seq_len, s, MASK_VALUE)
    p = jnp.exp(s - lse_ref[0][:, None])
    # Padded q rows need no mask: their dO is zero, so both accumulants
    # below receive exactly zero from them (dp=0 and dvec=0 ⇒ ds=0).
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, hd]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - dvec_ref[0][:, None]) * scale).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bk, hd]

    @pl.when(q_idx == num_q_blocks - 1)
    def _emit():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def blockwise_attention_bwd(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    of: jax.Array,
    lse: jax.Array,
    dof: jax.Array,
    *,
    scale: float,
    seq_len: int,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
):
    """Blockwise flash backward on flat pre-padded [n, t_pad, hd] arrays.

    Returns (dq, dk, dv), each [n, t_pad, hd] in the input dtype. ``lse`` is
    the forward's [n, t_pad] log-sum-exp; padded dO rows must be zero.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, t_pad, hd = qf.shape
    num_q_blocks = t_pad // block_q
    num_kv_blocks = t_pad // block_k
    # D = rowsum(dO ⊙ O) — one fused elementwise+reduce pass in XLA.
    dvec = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1)

    qspec = lambda bi, qi, ki: (bi, qi, 0)  # noqa: E731
    kspec = lambda bi, qi, ki: (bi, ki, 0)  # noqa: E731
    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, scale=scale, seq_len=seq_len,
            block_k=block_k, num_kv_blocks=num_kv_blocks,
        ),
        grid=(n, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), qspec),
            pl.BlockSpec((1, block_k, hd), kspec),
            pl.BlockSpec((1, block_k, hd), kspec),
            pl.BlockSpec((1, block_q, hd), qspec),
            pl.BlockSpec((1, block_q), lambda bi, qi, ki: (bi, qi)),
            pl.BlockSpec((1, block_q), lambda bi, qi, ki: (bi, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), qspec),
        out_shape=jax.ShapeDtypeStruct((n, t_pad, hd), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, dvec)

    # dK/dV: grid transposed — outer over KV tiles, inner (accumulating)
    # over Q tiles.
    qspec2 = lambda bi, ki, qi: (bi, qi, 0)  # noqa: E731
    kspec2 = lambda bi, ki, qi: (bi, ki, 0)  # noqa: E731
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, seq_len=seq_len,
            block_k=block_k, num_q_blocks=num_q_blocks,
        ),
        grid=(n, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), qspec2),
            pl.BlockSpec((1, block_k, hd), kspec2),
            pl.BlockSpec((1, block_k, hd), kspec2),
            pl.BlockSpec((1, block_q, hd), qspec2),
            pl.BlockSpec((1, block_q), lambda bi, ki, qi: (bi, qi)),
            pl.BlockSpec((1, block_q), lambda bi, ki, qi: (bi, qi)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, hd), kspec2),
            pl.BlockSpec((1, block_k, hd), kspec2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, t_pad, hd), kf.dtype),
            jax.ShapeDtypeStruct((n, t_pad, hd), vf.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, hd), jnp.float32),
            pltpu.VMEM((block_k, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, dvec)
    return dq, dk, dv


def _packed_reference_math(qkv: jax.Array, num_heads: int, head_dim: int):
    """Packed [B, T, 3D] attention in differentiable jnp ops (slab packing)."""
    b, t, _ = qkv.shape
    d = num_heads * head_dim
    q, k, v = qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:]

    def split(x):
        return x.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * (1.0 / np.sqrt(head_dim))
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    return o.transpose(0, 2, 1, 3).reshape(b, t, d)


def _packed_split(qkv: jax.Array, num_heads: int, head_dim: int):
    """Packed slab [B, T, 3D] → three flat [B*H, T, hd] arrays."""
    b, t, _ = qkv.shape
    d = num_heads * head_dim

    def split(x):
        x = x.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        return x.reshape(b * num_heads, t, head_dim)

    return split(qkv[..., :d]), split(qkv[..., d:2 * d]), split(qkv[..., 2 * d:])


def _packed_merge(xf: jax.Array, b: int, num_heads: int, head_dim: int):
    """Flat [B*H, T, hd] → head-major [B, T, H*hd]."""
    t = xf.shape[1]
    x = xf.reshape(b, num_heads, t, head_dim).transpose(0, 2, 1, 3)
    return x.reshape(b, t, num_heads * head_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def packed_fused_attention_trainable(qkv, num_heads: int, head_dim: int,
                                     images_per_cell: int | None = None,
                                     bwd_images_per_cell: int | None = None):
    """Differentiable fused attention on packed [B, T, 3D] input.

    Pallas in both directions, routed by sequence length:
      * padded T <= SINGLE_PASS_MAX_T — packed single-pass forward +
        whole-row rematerializing backward (``packed_attention_bwd``);
      * longer — blockwise flash forward (saving log-sum-exp) + blockwise
        backward (``blockwise_attention_bwd``): no [T, T] residency in
        either direction, so training length is unbounded like inference.
    ``images_per_cell`` / ``bwd_images_per_cell`` are the autotune launch
    knobs for the short-sequence route's forward / backward kernels (the
    tuned-literals role of the reference's hand-picked dispatch sizes,
    ViT_opencl.c:510); the long-sequence blockwise route ignores them.
    First-order reverse-mode only (a standard custom_vjp restriction — use
    ``_packed_reference_math`` if higher-order derivatives are ever needed).
    """
    out, _ = _trainable_fwd(qkv, num_heads, head_dim, images_per_cell,
                            bwd_images_per_cell)
    return out


def _is_long_seq(t: int) -> bool:
    return max(_cdiv(t, 128) * 128, 128) > SINGLE_PASS_MAX_T


def _trainable_fwd(qkv, num_heads, head_dim, images_per_cell=None,
                   bwd_images_per_cell=None):
    b, t, _ = qkv.shape
    if not _is_long_seq(t):
        out = packed_fused_attention(qkv, num_heads=num_heads,
                                     head_dim=head_dim,
                                     images_per_cell=images_per_cell)
        return out, (qkv, None, None)
    interpret = jax.default_backend() != "tpu"
    scale = float(1.0 / np.sqrt(head_dim))
    t_pad = _cdiv(t, 128) * 128
    qf, kf, vf = _packed_split(qkv, num_heads, head_dim)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
    of, lse = _blockwise_fwd_flat(
        qf, kf, vf, scale=scale, seq_len=t,
        block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
        interpret=interpret, return_lse=True,
    )
    out = _packed_merge(of[:, :t], b, num_heads, head_dim)
    return out, (qkv, of, lse)


def _trainable_bwd(num_heads, head_dim, images_per_cell,
                   bwd_images_per_cell, res, g):
    qkv, of, lse = res
    if of is None:
        return (packed_attention_bwd(
            qkv, g, num_heads, head_dim,
            images_per_cell=bwd_images_per_cell),)
    b, t, _ = qkv.shape
    interpret = jax.default_backend() != "tpu"
    scale = float(1.0 / np.sqrt(head_dim))
    t_pad = of.shape[1]
    qf, kf, vf = _packed_split(qkv, num_heads, head_dim)
    # Split the cotangent the same way as q (it is head-major [B, T, D]).
    gf = g.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
    gf = gf.reshape(b * num_heads, t, head_dim)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
        gf = jnp.pad(gf, pad)  # zero-padded dO rows contribute no gradient
    dq, dk, dv = blockwise_attention_bwd(
        qf, kf, vf, of, lse, gf, scale=scale, seq_len=t,
        block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K, interpret=interpret,
    )
    dqkv = jnp.concatenate(
        [_packed_merge(d[:, :t], b, num_heads, head_dim)
         for d in (dq, dk, dv)],
        axis=-1,
    )
    return (dqkv.astype(qkv.dtype),)


packed_fused_attention_trainable.defvjp(_trainable_fwd, _trainable_bwd)


# ---------------------------------------------------------------------------
# Packed-layout fused attention: consumes the QKV projection's natural output
# ---------------------------------------------------------------------------


def _packed_kernel(qkv_ref, o_ref, *, scale: float, seq_len: int,
                   num_heads: int, head_dim: int, images_per_cell: int,
                   packing: str = "slab"):
    """qkv block [images_per_cell, T, 3*H*hd] (packed q|k|v, head-major
    within each) → ctx block [images_per_cell, T, H*hd].

    All per-head slices are static offsets into VMEM — the head loop is
    unrolled at trace time. Scores/softmax stay in registers/VMEM; nothing
    [T, T]-shaped ever reaches HBM. Blocks are deliberately UNPADDED: Mosaic
    masks ragged tile tails itself, which measures ~35% faster at T=197 than
    padding to 256 (and removes the pad/slice HBM round trips entirely).
    """
    d = num_heads * head_dim
    t_in = qkv_ref.shape[1]
    neg = None
    if t_in != seq_len:
        # Padded route: additive mask for the zero-padded KV tail, hoisted
        # once per cell (shared by every head/image).
        col = jax.lax.broadcasted_iota(jnp.int32, (t_in, t_in), 1)
        neg = jnp.where(col < seq_len, 0.0, MASK_VALUE).astype(jnp.float32)
    for img in range(images_per_cell):
        qkv = qkv_ref[img]  # [T, 3D]
        for h in range(num_heads):
            qo, ko, vo = _packed_offsets(packing, h, num_heads, head_dim)
            o, _ = _head_attention(
                qkv[:, qo:qo + head_dim],
                qkv[:, ko:ko + head_dim],
                qkv[:, vo:vo + head_dim],
                scale, neg,
            )
            o_ref[img, :, h * head_dim:(h + 1) * head_dim] = o.astype(
                o_ref.dtype
            )


def packed_fused_attention(
    qkv: jax.Array,
    config: Optional[ViTConfig] = None,
    *,
    num_heads: Optional[int] = None,
    head_dim: Optional[int] = None,
    packing: str = "slab",
    images_per_cell: int | None = None,
    interpret: bool | None = None,
    true_seq_len: Optional[int] = None,
    ragged: Optional[bool] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Fused attention over packed QKV: [B, T, 3D] → [B, T, D].

    The fast path for the jit engine: the QKV matmul's output feeds straight
    in (same packed q|k|v layout the reference's ``QKV`` kernel emits,
    multihead.cl:21-22), so no head-axis transposes or per-operand relayouts
    are materialized in HBM — the launch overhead that made the generic
    [B, H, T, hd] entry point lose to XLA einsums at 197 tokens.

    ``true_seq_len``: set when the caller's token axis is ALREADY padded
    (e.g. sequence-parallel shards gathered back to a ring-divisible
    length): KV columns >= true_seq_len are masked out of the softmax;
    padded query rows return garbage in their own rows only.

    ``ragged``: force the unpadded (True) or padded (False) block route
    instead of the RAGGED_MAX_BLOCK_BYTES heuristic (autotune measures the
    real crossover per config). ``block_q``/``block_k`` tune the blockwise
    long-sequence route.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, three_d = qkv.shape
    seq = true_seq_len if true_seq_len is not None else t
    nh = num_heads if num_heads is not None else config.num_heads
    hd = head_dim if head_dim is not None else config.head_dim
    d = nh * hd
    assert three_d == 3 * d, (three_d, d)
    if packing not in ("slab", "per_head"):
        raise ValueError(f"unknown packing {packing!r}")
    scale = float(1.0 / np.sqrt(hd))
    if _is_long_seq(t):
        # Whole-sequence-in-VMEM stops fitting: reroute through the blockwise
        # online-softmax kernel (the head split/merge transposes are noise
        # next to O(T^2) attention at these lengths).
        if packing != "slab":
            raise NotImplementedError(
                "long-sequence packed attention supports slab packing only"
            )
        lcm = block_q * block_k // math.gcd(block_q, block_k)
        t_pad = _cdiv(t, lcm) * lcm
        qf, kf, vf = _packed_split(qkv, nh, hd)
        if t_pad != t:
            pad = ((0, 0), (0, t_pad - t), (0, 0))
            qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
        of, _ = _blockwise_fwd_flat(
            qf, kf, vf, scale=scale, seq_len=seq,
            block_q=block_q, block_k=block_k,
            interpret=interpret, return_lse=False,
        )
        return _packed_merge(of[:, :t], b, nh, hd)
    if images_per_cell is None:
        # v5e sweeps (perf/autotune.py): one image per grid cell is fastest
        # when a cell already holds enough per-head matmuls (ViT-B, 12 heads:
        # 72.2 vs 74.3 ms/batch in-model), but few-head models want several
        # images to amortize cell overhead (ViT-Tiny, 3 heads: ipc=4 is ~10%
        # faster). Target ~a dozen head-matmul pairs per cell.
        images_per_cell = int(max(1, min(4, b, 12 // nh)))
    while b % images_per_cell:
        images_per_cell -= 1
    # Ragged (unpadded) blocks are fastest at @224 scale — Mosaic masks the
    # tile tails and the pad/slice HBM round trips disappear — but its
    # internal relayout buffers for misaligned rows blow the 16 MB scoped
    # VMEM limit once the (whole, images_per_cell-wide) block gets big
    # (empirically: 577x3072 OOMs, 197x2304 is comfortable). Route by block
    # size; pad above the knee.
    qkv_block_bytes = images_per_cell * t * 3 * d * qkv.dtype.itemsize
    ragged_ok = (ragged if ragged is not None
                 else qkv_block_bytes <= RAGGED_MAX_BLOCK_BYTES)
    t_in = t
    if not ragged_ok:
        t_kernel = max(_cdiv(t, 128) * 128, 128)
        if t_kernel != t:
            qkv = jnp.pad(qkv, ((0, 0), (0, t_kernel - t), (0, 0)))
        t_in = t_kernel

    kernel = functools.partial(
        _packed_kernel, scale=scale, seq_len=seq, num_heads=nh, head_dim=hd,
        images_per_cell=images_per_cell, packing=packing,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // images_per_cell,),
        in_specs=[
            pl.BlockSpec((images_per_cell, t_in, 3 * d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((images_per_cell, t_in, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_in, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # The default 16 MB scoped limit is conservative (v5e VMEM is far
            # larger); the unrolled head loop's overlapped temporaries need
            # ~31 MB at ViT-L @384 scale.
            vmem_limit_bytes=32 << 20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nh * t_in * t_in * hd,
            bytes_accessed=4 * b * t_in * d * qkv.dtype.itemsize,
            transcendentals=b * nh * t_in * t_in,
        ),
        interpret=interpret,
    )(qkv)
    return out[:, :t] if t_in != t else out
