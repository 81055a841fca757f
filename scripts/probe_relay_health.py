"""Relay health probe: separate tunnel round-trip latency from chip
throughput so degraded-relay sessions are detected BEFORE trusting any
timing (see CLAUDE.md: the tunnel degrades for minutes after killed
processes and every sub-floor measurement reads as the floor).

Times one fetch of a chained bf16 GEMM at several scan lengths; the
slope is chip throughput, the intercept is the per-dispatch+fetch floor.
Healthy state: floor < 50 ms (measured ~25 ms), slope ~150+ TF/s.

Fence discipline (round-4 lesson): slice ON DEVICE before np.asarray —
`np.asarray(full_array)` ships the whole buffer over the ~40 MB/s tunnel
and a 6 MB output reads as a 150 ms "kernel"; a 32 MB one as ~720 ms.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    a = jax.jit(lambda: (jax.lax.broadcasted_iota(
        jnp.int32, (N, N), 0) % 13).astype(jnp.bfloat16) * 0.03)()

    def chained(scan_len):
        @jax.jit
        def run(y):
            def step(c, _):
                c = jnp.dot(c, y, preferred_element_type=jnp.float32)
                return (c * (1.0 / N)).astype(jnp.bfloat16), None
            out, _ = jax.lax.scan(step, y, None, length=scan_len)
            return out
        return run

    pts = []
    for L in (1, 4, 16, 64):
        run = chained(L)
        np.asarray(run(a).ravel()[:1])  # compile+warm (device-side slice)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(a)
            np.asarray(out.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        tf = 2 * N ** 3 * L / 1e12
        pts.append((L, best))
        print(f"len={L:3d}: {best * 1e3:9.3f} ms  ({tf / best:6.1f} TF/s)",
              flush=True)

    (l0, t0_), (l1, t1_) = pts[0], pts[-1]
    slope = (t1_ - t0_) / (l1 - l0)
    floor = t0_ - slope * l0
    tf_per = 2 * N ** 3 / 1e12
    print(f"\nfloor ~{floor * 1e3:.1f} ms/fetch, chip rate ~"
          f"{tf_per / slope:.1f} TF/s "
          f"({'HEALTHY' if floor < 0.05 and tf_per / slope > 100 else 'DEGRADED'})",
          flush=True)


if __name__ == "__main__":
    main()
