"""Root-cause probe for the measured-vs-spec ceiling gap (round-3).

Round 2 calibrated the tunneled chip at ~156 TF/s bf16 vs the 197 TF/s v5e
spec and asserted — without evidence — that the gap is environmental. This
probe separates the candidate causes:

1. DISPATCH OVERHEAD (tunnel/runtime): time L GEMMs CHAINED INSIDE ONE JIT
   PROGRAM via lax.scan — zero host round-trips, zero dispatch gaps. If the
   in-program rate approaches spec, the gap lives between programs; if it
   stays at ~156, the silicon itself sustains less than spec.
2. THROTTLING (clock/power/thermal): sustain the scan program back to back
   for ~60 s and report the per-chunk rate over time. A downward drift means
   burst clocks; flat means steady-state silicon.
3. SHAPE SENSITIVITY: sweep M/K/N geometry (square vs skewed, 4k-16k) to
   rule out a tiling corner — the spec number assumes an ideal shape.

Run on the real chip:  python scripts/probe_ceiling.py
Env: PROBE_SCAN_LENS, PROBE_SUSTAIN_S, PROBE_SHAPES ("8192x8192x8192;...").
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _mat(m, n, salt, dtype=jnp.bfloat16, scale=0.01):
    """Deterministic on-device matrix (iota hash — no big RNG programs and
    no tunneled H2D; see CLAUDE.md)."""
    return jax.jit(
        lambda: ((jax.lax.broadcasted_iota(jnp.int32, (m, n), salt % 2)
                  * 16807 + salt) % 251).astype(dtype) * scale
    )()


def _fence(x):
    np.asarray(x.ravel()[:1])


def chained_gemm_program(n_dim: int, scan_len: int):
    """(run, y0, b): scan_len GEMMs chained inside ONE jit program, warmed.

    y_{i+1} = (y_i @ B) * (1/n) keeps magnitudes bounded; the rescale is
    O(n^2) against the GEMM's O(n^3) — noise. The carry dependency defeats
    DCE and forces sequential execution. The ONE chained-GEMM methodology —
    both the scan-length sweep and the sustain (throttling) probe time this
    exact program, so their comparison stays apples-to-apples.
    """
    y0 = _mat(n_dim, n_dim, 1)
    b = _mat(n_dim, n_dim, 2)
    inv = jnp.bfloat16(1.0 / n_dim)

    @jax.jit
    def run(y, bmat):
        def step(carry, _):
            return (jnp.dot(carry, bmat,
                            preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) * inv), None

        out, _ = jax.lax.scan(step, y, None, length=scan_len)
        return out

    _fence(run(y0, b))  # compile + warm
    return run, y0, b


def chained_gemm_rate(n_dim: int, scan_len: int, *, reps: int = 3):
    """Best-of-reps TF/s of the chained-GEMM program."""
    run, y0, b = chained_gemm_program(n_dim, scan_len)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(y0, b)
        _fence(out)
        dt = time.perf_counter() - t0
        best = max(best, 2 * n_dim**3 * scan_len / 1e12 / dt)
    return best


def dispatched_gemm_rate(n_dim: int, iters: int = 30):
    """Round-2 methodology: `iters` queued dispatches, one fence."""
    a = _mat(n_dim, n_dim, 1)
    b = _mat(n_dim, n_dim, 2)
    g = jax.jit(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    _fence(g(a, b))
    _fence(g(a, b))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = g(a, b)
    _fence(o)
    dt = time.perf_counter() - t0
    return 2 * n_dim**3 * iters / 1e12 / dt


def shaped_gemm_rate(m, k, n, iters: int = 20):
    a = _mat(m, k, 1)
    b = _mat(k, n, 2)
    g = jax.jit(lambda x, y: jnp.dot(
        x, y, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    _fence(g(a, b))
    _fence(g(a, b))
    t0 = time.perf_counter()
    o = None
    for _ in range(iters):
        o = g(a, b)
    _fence(o)
    dt = time.perf_counter() - t0
    return 2 * m * k * n * iters / 1e12 / dt


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    # Health probe (CLAUDE.md: relay can be mid-drain after kills).
    t0 = time.perf_counter()
    _fence(jax.jit(lambda: jnp.dot(_mat(256, 256, 9), _mat(256, 256, 10)))())
    print(f"health matmul fetch: {time.perf_counter() - t0:.2f}s",
          file=sys.stderr)

    n_dim = 8192
    scan_lens = [int(s) for s in os.environ.get(
        "PROBE_SCAN_LENS", "8,32,128").split(",")]

    print("\n-- 1) in-program chained GEMMs (no dispatch between GEMMs) --")
    in_prog = {}
    for L in scan_lens:
        tf = chained_gemm_rate(n_dim, L)
        in_prog[L] = tf
        print(f"scan_len={L:4d}: {tf:6.1f} TF/s")

    print("\n-- 2) dispatched GEMMs (round-2 calibration methodology) --")
    disp = dispatched_gemm_rate(n_dim)
    print(f"queued dispatch 8192^3: {disp:6.1f} TF/s")

    print("\n-- 3) sustained run (throttling probe) --")
    sustain_s = float(os.environ.get("PROBE_SUSTAIN_S", "60"))
    L = max(scan_lens)
    run, y0, b = chained_gemm_program(n_dim, L)  # identical methodology
    t_start = time.perf_counter()
    chunk_rates = []
    while time.perf_counter() - t_start < sustain_s:
        t0 = time.perf_counter()
        out = run(y0, b)
        _fence(out)
        dt = time.perf_counter() - t0
        chunk_rates.append(2 * n_dim**3 * L / 1e12 / dt)
    third = max(1, len(chunk_rates) // 3)
    first, last = chunk_rates[:third], chunk_rates[-third:]
    print(f"{len(chunk_rates)} chunks over {time.perf_counter()-t_start:.0f}s:"
          f" first-third mean {np.mean(first):.1f} TF/s,"
          f" last-third mean {np.mean(last):.1f} TF/s,"
          f" min {min(chunk_rates):.1f}, max {max(chunk_rates):.1f}")

    print("\n-- 4) shape sweep (dispatched) --")
    shapes_env = os.environ.get(
        "PROBE_SHAPES",
        "4096x4096x4096;8192x8192x8192;16384x8192x8192;8192x16384x8192;"
        "8192x8192x16384;16384x16384x8192",
    )
    for s in shapes_env.split(";"):
        m, k, n = (int(v) for v in s.split("x"))
        tf = shaped_gemm_rate(m, k, n)
        print(f"{m:6d}x{k:6d}x{n:6d}: {tf:6.1f} TF/s")

    print("\nsummary:")
    best_in_prog = max(in_prog.values())
    print(f"  best in-program rate : {best_in_prog:.1f} TF/s")
    print(f"  dispatched rate      : {disp:.1f} TF/s")
    print(f"  dispatch overhead    : "
          f"{(1 - disp / best_in_prog) * 100:+.1f}% vs in-program")
    print(f"  sustained drift      : "
          f"{(np.mean(last) / np.mean(first) - 1) * 100:+.1f}% "
          f"(negative = throttling)")
    print(f"  vs v5e spec 197 TF/s : {best_in_prog / 197.0 * 100:.1f}%")


if __name__ == "__main__":
    main()
