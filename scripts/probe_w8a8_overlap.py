"""Can VPU work overlap the int8 MXU inside a Pallas kernel? (round 4)

The W8A8 fused-layer flagship runs at 83.6% of its own int8-GEMM skeleton
with a ~16% serial VPU share (BENCH.md). Round 3 asserted "more fusion can't
help" from substitution attribution alone; this probe measures the question
directly with synthetic kernels whose dependency graphs ISOLATE the overlap:

  stream    read the block, touch it, write a tiny slice (DMA/loop baseline)
  vpu:q     per-row absmax int8 quantization only (the W8A8 VPU stage)
  vpu:ln    fp32 LayerNorm only (the other big VPU stage)
  mxu       int8 x int8 -> int32 GEMM only, fp32 scale epilogue
  fused     quantize chunk c -> GEMM chunk c (production W8A8 shape; the
            graph still permits quantize(c+1) || GEMM(c) across chunks)
  indep     quantize stream A || GEMM stream B — ZERO data dependencies
            between the VPU and MXU work. If Mosaic/the core can overlap
            the units at all, this kernel runs at max(vpu, mxu); if they
            share issue bandwidth architecturally, it runs at vpu + mxu.

Interpretation:
  indep ~= max(vpu, mxu) + eps  -> overlap exists; restructure production.
  indep ~= vpu + mxu            -> serialization is architectural; the
                                   83.6%-of-skeleton bound is real and the
                                   fused kernel is at speed-of-light.

Shapes mirror the ViT-B fc1 GEMM (K=768, N=3072), 1024-row blocks x 8
chunks, grid of 256 blocks (~4.4 ms of MXU work per call at the 279 TOPS
ceiling — dispatch noise < 5%).

Run on the real chip:  python scripts/probe_w8a8_overlap.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_BLOCK = 1024
N_CHUNKS = 8
M_CHUNK = M_BLOCK // N_CHUNKS
K = 768
N = 3072
GRID = 256
EPS = 1e-6


def _fence(x):
    # Slice ON DEVICE first: np.asarray(full array) would ship the whole
    # buffer over the ~40 MB/s tunnel (a 6 MB output reads as a 150 ms
    # "kernel time") — the round-4 probe-inversion root cause.
    np.asarray(x.ravel()[:1])


def _fetch_floor(x, reps=5):
    """Dispatch+fetch round trip for a 1-element slice of a ready array —
    the fixed cost every timed fence pays on this tunnel (~25 ms)."""
    _fence(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(x)
        best = min(best, time.perf_counter() - t0)
    return best


def _quantize_rows(hf):
    absmax = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True),
                         jnp.float32(2.0 ** -93))
    r = jnp.float32(127.0) / absmax
    q = jnp.clip(jnp.round(hf * r), -127, 127).astype(jnp.int8)
    return q, absmax * jnp.float32(1 / 127)


def _ln(xf, eps=EPS):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    return (xf - mean) * jax.lax.rsqrt(var + eps)


# --- kernels -----------------------------------------------------------


def _k_stream(x_ref, o_ref):
    o_ref[...] = x_ref[:8, :128] * 2.0


def _k_vpu_quant(x_ref, oq_ref, os_ref):
    for c in range(N_CHUNKS):
        sl = slice(c * M_CHUNK, (c + 1) * M_CHUNK)
        q, s = _quantize_rows(x_ref[sl, :])
        oq_ref[sl, :] = q
        os_ref[sl, :] = s


def _k_vpu_ln(x_ref, o_ref):
    for c in range(N_CHUNKS):
        sl = slice(c * M_CHUNK, (c + 1) * M_CHUNK)
        o_ref[sl, :] = _ln(x_ref[sl, :]).astype(jnp.bfloat16)


def _k_mxu(xq_ref, w_ref, sw_ref, o_ref):
    for c in range(N_CHUNKS):
        sl = slice(c * M_CHUNK, (c + 1) * M_CHUNK)
        acc = jax.lax.dot_general(xq_ref[sl, :], w_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[sl, :] = (acc.astype(jnp.float32) * sw_ref[...]
                        ).astype(jnp.bfloat16)


def _k_fused(x_ref, w_ref, sw_ref, o_ref):
    for c in range(N_CHUNKS):
        sl = slice(c * M_CHUNK, (c + 1) * M_CHUNK)
        q, s = _quantize_rows(x_ref[sl, :])
        acc = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[sl, :] = (acc.astype(jnp.float32) * s * sw_ref[...]
                        ).astype(jnp.bfloat16)


def _k_indep(xa_ref, xqb_ref, w_ref, sw_ref, oq_ref, os_ref, o_ref,
             vpu_op: str = "quant"):
    # Interleave the issue order chunk-by-chunk so the scheduler sees the
    # independent VPU and MXU work side by side, not in two distant phases.
    for c in range(N_CHUNKS):
        sl = slice(c * M_CHUNK, (c + 1) * M_CHUNK)
        if vpu_op == "quant":
            q, s = _quantize_rows(xa_ref[sl, :])
            oq_ref[sl, :] = q
            os_ref[sl, :] = s
        else:
            oq_ref[sl, :] = _ln(xa_ref[sl, :]).astype(jnp.bfloat16)[:, :K]
            os_ref[sl, :] = xa_ref[sl, :1]
        acc = jax.lax.dot_general(xqb_ref[sl, :], w_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[sl, :] = (acc.astype(jnp.float32) * sw_ref[...]
                        ).astype(jnp.bfloat16)


# --- launch + timing ----------------------------------------------------


def _block(i):
    return (i, 0)


def _resident(i):
    return (0, 0)


def _call(kernel, in_specs, out_specs, out_shape, operands, reps=3,
          chain=50):
    """Best-of-``reps`` per-call seconds, each rep enqueueing ``chain``
    back-to-back async dispatches and fencing ONCE — the measured fetch
    floor (~25 ms on this tunnel) is subtracted, so ~5 ms kernels are
    resolved to a few percent instead of being swallowed by the floor."""
    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=96 << 20,
        ),
    )
    run = jax.jit(lambda *a: f(*a))
    out = run(*operands)  # compile + warm
    leaf = jax.tree.leaves(out)[0]
    _fence(leaf)
    floor = _fetch_floor(leaf)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = run(*operands)
        _fence(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0 - floor)
    return best / chain


def _x_f32(rows, salt):
    return jax.jit(
        lambda: ((jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1)
                  * 16807 + salt) % 251).astype(jnp.float32) * 0.013 - 1.6
    )()


def _x_i8(rows, salt):
    return jax.jit(
        lambda: (((jax.lax.broadcasted_iota(jnp.int32, (rows, K), 0)
                   * 16807 + salt) % 251) - 125).astype(jnp.int8)
    )()


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    _fence(jax.jit(jnp.dot)(jnp.ones((256, 256), jnp.bfloat16),
                            jnp.ones((256, 256), jnp.bfloat16)))
    print(f"health matmul fetch: {time.perf_counter() - t0:.2f}s", flush=True)

    rows = GRID * M_BLOCK
    xf = _x_f32(rows, 7)
    xq = _x_i8(rows, 11)
    w = _x_i8(K, 3)[:, :1].astype(jnp.int8) * jnp.ones((1, N), jnp.int8)
    w = jax.jit(lambda a: jnp.clip(a, -125, 125))(w)
    sw = jnp.full((1, N), 3e-4, jnp.float32)

    xf_spec = pl.BlockSpec((M_BLOCK, K), _block)
    xq_spec = pl.BlockSpec((M_BLOCK, K), _block)
    w_spec = pl.BlockSpec((K, N), _resident)
    sw_spec = pl.BlockSpec((1, N), _resident)
    oq_spec = pl.BlockSpec((M_BLOCK, K), _resident)
    os_spec = pl.BlockSpec((M_BLOCK, 1), _resident)
    obf_spec = pl.BlockSpec((M_BLOCK, N), _resident)

    gemm_tops = 2 * rows * K * N / 1e12

    t_stream = _call(
        _k_stream, [xf_spec],
        pl.BlockSpec((8, 128), _resident),
        jax.ShapeDtypeStruct((8, 128), jnp.float32), [xf])
    print(f"stream  (f32 in, touch):            {t_stream * 1e3:7.3f} ms",
          flush=True)

    t_q = _call(
        _k_vpu_quant, [xf_spec],
        (oq_spec, os_spec),
        (jax.ShapeDtypeStruct((M_BLOCK, K), jnp.int8),
         jax.ShapeDtypeStruct((M_BLOCK, 1), jnp.float32)), [xf])
    print(f"vpu:q   (quantize rows only):       {t_q * 1e3:7.3f} ms",
          flush=True)

    t_ln = _call(
        _k_vpu_ln, [xf_spec],
        pl.BlockSpec((M_BLOCK, K), _resident),
        jax.ShapeDtypeStruct((M_BLOCK, K), jnp.bfloat16), [xf])
    print(f"vpu:ln  (layernorm only):           {t_ln * 1e3:7.3f} ms",
          flush=True)

    t_mxu = _call(
        _k_mxu, [xq_spec, w_spec, sw_spec],
        obf_spec,
        jax.ShapeDtypeStruct((M_BLOCK, N), jnp.bfloat16), [xq, w, sw])
    print(f"mxu     (int8 GEMM only):           {t_mxu * 1e3:7.3f} ms "
          f"({gemm_tops / t_mxu:6.1f} TOPS)", flush=True)

    t_fused = _call(
        _k_fused, [xf_spec, w_spec, sw_spec],
        obf_spec,
        jax.ShapeDtypeStruct((M_BLOCK, N), jnp.bfloat16), [xf, w, sw])
    print(f"fused   (quantize->GEMM, prod W8A8):{t_fused * 1e3:7.3f} ms "
          f"({gemm_tops / t_fused:6.1f} TOPS)", flush=True)

    for vpu_op, t_vpu, label in (("quant", t_q, "vpu:q"),
                                 ("ln", t_ln, "vpu:ln")):
        t_ind = _call(
            functools.partial(_k_indep, vpu_op=vpu_op),
            [xf_spec, xq_spec, w_spec, sw_spec],
            ((oq_spec if vpu_op == "quant"
              else pl.BlockSpec((M_BLOCK, K), _resident)),
             os_spec, obf_spec),
            ((jax.ShapeDtypeStruct((M_BLOCK, K), jnp.int8)
              if vpu_op == "quant"
              else jax.ShapeDtypeStruct((M_BLOCK, K), jnp.bfloat16)),
             jax.ShapeDtypeStruct((M_BLOCK, 1), jnp.float32),
             jax.ShapeDtypeStruct((M_BLOCK, N), jnp.bfloat16)),
            [xf, xq, w, sw])
        hi = t_vpu + t_mxu
        lo = max(t_vpu, t_mxu)
        frac = (hi - t_ind) / max(hi - lo, 1e-9)
        print(f"indep   ({label} || mxu):            {t_ind * 1e3:7.3f} ms  "
              f"[serial={hi * 1e3:.3f}, max={lo * 1e3:.3f} -> "
              f"overlap {frac * 100:5.1f}%]", flush=True)

    print(f"\nfused vs mxu+vpu:q serial sum: {t_fused / (t_q + t_mxu):.3f}x; "
          f"fused vs mxu alone: {t_fused / t_mxu:.3f}x", flush=True)


if __name__ == "__main__":
    main()
