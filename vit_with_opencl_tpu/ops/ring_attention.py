"""Ring attention: context parallelism with communication/compute overlap.

For sequences long enough that all-gathering K/V (parallel/spmd.sp_forward)
is too expensive, ring attention keeps K/V sharded: each device holds one
sequence shard, computes blockwise attention against the block it currently
holds, and rotates that block to its ring neighbor with ``jax.lax.ppermute``
while maintaining online-softmax statistics (running max m, running sum l,
rescaled accumulator) — the same rescaling identity as the flash kernel
(ops/attention.py), applied across devices instead of across tiles. After
N−1 rotations every query shard has attended to every KV position; total
bytes moved equal one all-gather, but as neighbor-to-neighbor transfers that
overlap with the matmuls.

Not needed at the reference's 197 tokens (or even 577): the BASELINE configs
are served by the single-chip flash kernel and all-gather SP. This is the
scaling path past ~100K tokens, validated for correctness on the virtual
mesh against the golden math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _pick_block(t_loc: int) -> int:
    """Largest standard flash block dividing the shard, else the whole shard
    as one (possibly ragged) block — small shards are one-tile anyway."""
    for cand in (512, 256, 128):
        if t_loc % cand == 0:
            return cand
    return t_loc


def ring_attention_shard(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    scale: float,
    seq_len: Optional[int] = None,
    shard_tokens: Optional[int] = None,
    impl: str = "auto",
) -> jax.Array:
    """Per-shard ring attention body (call inside shard_map).

    q, k, v: this device's sequence shard, [B, H, T_loc, hd]; the sequence
    axis is sharded over ``axis_name``. ``seq_len`` masks global positions
    >= seq_len (padding added to make T divide the ring size). Returns the
    attention output for the local query shard.

    ``impl``:
      * "blockwise" — each rotation's local step runs the Pallas
        carry-in/carry-out flash kernel (ops/attention.blockwise_ring_step):
        nothing [T_loc, T_loc]-shaped reaches HBM, so memory stays
        O(T_loc · hd) regardless of sequence length — the real
        long-context path;
      * "einsum" — XLA einsum local step (scores materialize per rotation;
        fine for small shards / debugging);
      * "auto" — blockwise for shards of >= 128 tokens, einsum below.
    """
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, t_loc, hd = q.shape
    if shard_tokens is None:
        shard_tokens = t_loc
    if impl == "auto":
        impl = "blockwise" if t_loc >= 128 else "einsum"
    if impl not in ("blockwise", "einsum"):
        raise ValueError(f"unknown ring attention impl {impl!r}")
    perm = [(i, (i + 1) % n) for i in range(n)]

    if impl == "blockwise":
        return _ring_blockwise(q, k, v, axis_name=axis_name, scale=scale,
                               seq_len=seq_len, shard_tokens=shard_tokens,
                               n=n, my_idx=my_idx, perm=perm)

    m = jnp.full((b, h, t_loc, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, t_loc, 1), jnp.float32)
    acc = jnp.zeros((b, h, t_loc, hd), jnp.float32)

    def step(carry, step_idx):
        m, l, acc, k_blk, v_blk = carry
        # Which shard this KV block originated from (global position mask).
        src = (my_idx - step_idx) % n
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk,
                       preferred_element_type=jnp.float32) * scale
        if seq_len is not None:
            kv_pos = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
                + src * shard_tokens
            )
            s = jnp.where(kv_pos < seq_len, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        # Rotate KV to the next device; the compiler overlaps this transfer
        # with the next step's matmuls (it is pure neighbor traffic).
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l, acc, k_blk, v_blk), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k, v), jnp.arange(n)
    )
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l).astype(q.dtype)


def _ring_blockwise(q, k, v, *, axis_name, scale, seq_len, shard_tokens,
                    n, my_idx, perm):
    """Ring body with the Pallas blockwise local step (carried stats)."""
    from . import attention

    b, h, t_loc, hd = q.shape
    nf = b * h
    block = _pick_block(t_loc)
    qf = q.reshape(nf, t_loc, hd)
    kf = k.reshape(nf, t_loc, hd)
    vf = v.reshape(nf, t_loc, hd)
    m = jnp.full((nf, t_loc), -jnp.inf, jnp.float32)
    l = jnp.zeros((nf, t_loc), jnp.float32)
    acc = jnp.zeros((nf, t_loc, hd), jnp.float32)

    def step(carry, step_idx):
        m, l, acc, k_blk, v_blk = carry
        src = (my_idx - step_idx) % n
        if seq_len is not None:
            # Live positions of the SOURCE shard: its global slice is
            # [src*shard_tokens, (src+1)*shard_tokens); ring padding sits at
            # the global tail, so validity is a per-shard prefix length.
            valid = seq_len - src * shard_tokens
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, t_loc), 1)
            bias = jnp.where(pos < valid, 0.0, MASK_VALUE).astype(jnp.float32)
        else:
            bias = jnp.zeros((1, t_loc), jnp.float32)
        m, l, acc = attention.blockwise_ring_step(
            qf, k_blk, v_blk, bias, m, l, acc,
            scale=scale, block_q=block, block_k=block,
        )
        # Rotate KV to the next device; neighbor traffic overlaps with the
        # next step's kernel.
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m, l, acc, k_blk, v_blk), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m, l, acc, kf, vf), jnp.arange(n)
    )
    l = jnp.where(l == 0.0, 1.0, l)
    out = acc / l[..., None]
    return out.reshape(b, h, t_loc, hd).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    config: ViTConfig,
    mesh,
    *,
    axis_name: str = "model",
    impl: str = "auto",
) -> jax.Array:
    """Convenience wrapper: full [B, H, T, hd] in, ring-sharded compute.

    Pads T to divide the ring, shards the sequence axis over ``axis_name``,
    runs the ring, gathers the output. For production long-context use, keep
    activations sharded and call ``ring_attention_shard`` inside your own
    shard_map instead of round-tripping through full arrays.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.spmd import _cached_program

    n = mesh.shape[axis_name]
    b, h, t, hd = q.shape
    t_pad = -(-t // n) * n
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    scale = float(1.0 / np.sqrt(config.head_dim))

    def fn(q, k, v):
        return ring_attention_shard(
            q, k, v, axis_name=axis_name, scale=scale, seq_len=t,
            shard_tokens=t_pad // n, impl=impl,
        )

    in_spec = P(None, None, axis_name, None)

    def build():
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(in_spec, in_spec, in_spec),
            out_specs=in_spec, check_vma=False,
        ))

    key = ("ring", mesh, axis_name, q.shape, jnp.dtype(q.dtype), t, scale,
           impl)
    out = _cached_program(key, build)(q, k, v)
    return out[:, :, :t] if t_pad != t else out
