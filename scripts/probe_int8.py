"""Probe the chip's native int8 MXU rate vs bf16 (round 3).

The v5e spec sheet lists 394 TOPS int8 vs 197 TF/s bf16 — a 2x MXU rate
when BOTH operands are int8 with int32 accumulation. Our current int8 path
(models/quant.py) is weight-only residency: int8 weights are cast to bf16
on the way into the MXU, so compute runs at the bf16 rate. If the tunneled
chip really does int8 at ~2x, a dynamic W8A8 path (per-token activation
quantization) on the four big GEMMs is the biggest remaining perf lever.

Methodology mirrors scripts/probe_ceiling.py: deterministic iota operands
(no big RNG programs over the relay), chained in-program GEMMs via
lax.scan for a dispatch-free rate, plus the queued-dispatch rate.

Run on the real chip:  python scripts/probe_int8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _mat_i8(m, n, salt):
    return jax.jit(
        lambda: (((jax.lax.broadcasted_iota(jnp.int32, (m, n), salt % 2)
                   * 16807 + salt) % 251) - 125).astype(jnp.int8)
    )()


def _mat_bf16(m, n, salt):
    return jax.jit(
        lambda: ((jax.lax.broadcasted_iota(jnp.int32, (m, n), salt % 2)
                  * 16807 + salt) % 251).astype(jnp.bfloat16) * 0.01
    )()


def _fence(x):
    np.asarray(x.ravel()[:1])


def chained_rate_int8(n_dim, scan_len, reps=3):
    """TOPS of scan_len int8 GEMMs chained in ONE program.

    Carry stays int8: the int32 accumulator is right-shifted back into
    int8 range (VPU, O(n^2) — noise vs the O(n^3) GEMM) so the data
    dependency defeats DCE without leaving the int domain.
    """
    y0 = _mat_i8(n_dim, n_dim, 1)
    b = _mat_i8(n_dim, n_dim, 2)

    @jax.jit
    def run(y, bmat):
        def step(carry, _):
            acc = jax.lax.dot_general(
                carry, bmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            nxt = jnp.clip(acc >> 16, -127, 127).astype(jnp.int8)
            return nxt, None

        out, _ = jax.lax.scan(step, y, None, length=scan_len)
        return out

    _fence(run(y0, b))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(y0, b)
        _fence(out)
        best = max(best, 2 * n_dim**3 * scan_len / 1e12
                   / (time.perf_counter() - t0))
    return best


def chained_rate_bf16(n_dim, scan_len, reps=3):
    y0 = _mat_bf16(n_dim, n_dim, 1)
    b = _mat_bf16(n_dim, n_dim, 2)
    inv = jnp.bfloat16(1.0 / n_dim)

    @jax.jit
    def run(y, bmat):
        def step(carry, _):
            return (jnp.dot(carry, bmat, preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) * inv), None

        out, _ = jax.lax.scan(step, y, None, length=scan_len)
        return out

    _fence(run(y0, b))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(y0, b)
        _fence(out)
        best = max(best, 2 * n_dim**3 * scan_len / 1e12
                   / (time.perf_counter() - t0))
    return best


def mixed_rate_w8a16(n_dim, scan_len, reps=3):
    """bf16 activations x int8 weights cast in-program (current quant path)."""
    y0 = _mat_bf16(n_dim, n_dim, 1)
    b = _mat_i8(n_dim, n_dim, 2)
    inv = jnp.bfloat16(1.0 / (n_dim * 125))

    @jax.jit
    def run(y, bq):
        def step(carry, _):
            acc = jnp.dot(carry, bq.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return (acc.astype(jnp.bfloat16) * inv), None

        out, _ = jax.lax.scan(step, y, None, length=scan_len)
        return out

    _fence(run(y0, b))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(y0, b)
        _fence(out)
        best = max(best, 2 * n_dim**3 * scan_len / 1e12
                   / (time.perf_counter() - t0))
    return best


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    _fence(jax.jit(lambda: jnp.dot(_mat_bf16(256, 256, 9),
                                   _mat_bf16(256, 256, 10)))())
    print(f"health matmul fetch: {time.perf_counter() - t0:.2f}s", flush=True)

    n = 8192
    for L in (8, 32):
        bf = chained_rate_bf16(n, L)
        print(f"bf16   chained 8192^3 x{L}: {bf:6.1f} TF/s", flush=True)
        i8 = chained_rate_int8(n, L)
        print(f"int8   chained 8192^3 x{L}: {i8:6.1f} TOPS "
              f"({i8 / bf:.2f}x bf16)", flush=True)
        mx = mixed_rate_w8a16(n, L)
        print(f"w8a16  chained 8192^3 x{L}: {mx:6.1f} TF/s "
              f"({mx / bf:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
