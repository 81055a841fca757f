"""Sustained-load soak: N consecutive batches through the jitted forward.

Reports per-window throughput (drift detection), min/max window, and a
finite-output check at the end. Mirrors the reference's long-run usage
(its per-picture clock() loop, ViT_opencl.c:964) at production batch size.

Usage: python scripts/soak.py [config] [batch] [batches] [window] [quant]
(quant: "int8-w8a8" / "int8" soaks the quantized production path)
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.models import vit


def main():
    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_b_16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    total = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    window = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    quant = sys.argv[5] if len(sys.argv) > 5 else None
    if quant not in (None, "int8", "int8-w8a8"):
        raise SystemExit(f"unknown quant mode {quant!r} "
                         "(use int8 or int8-w8a8)")
    cfg = get_config(name)
    params = vit.cheap_stacked_params(cfg)
    if quant:
        from vit_with_opencl_tpu.models import quant as quantlib

        params = jax.jit(
            lambda p: quantlib.quantize_stacked_params_device(p, cfg)
        )(params)
    r = np.random.default_rng(0)
    images = jnp.asarray(
        r.standard_normal((batch, 3, cfg.img_size, cfg.img_size)) * 0.3,
        dtype=jnp.bfloat16,
    )
    kern = vit.resolve_kernels("flash", w8a8=quant == "int8-w8a8")
    fwd = jax.jit(
        lambda im, p: vit.forward(im, p, cfg,
                                  compute_dtype=jnp.bfloat16, kernels=kern)
    )
    out = fwd(images, params)
    np.asarray(out.ravel()[:1])  # warm + fence

    rates = []
    done = 0
    while done < total:
        n = min(window, total - done)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(images, params)
        np.asarray(out.ravel()[:1])
        dt = time.perf_counter() - t0
        rates.append(n * batch / dt)
        done += n
        print(f"  window {len(rates):3d}: {rates[-1]:9.0f} img/s")
    final = np.asarray(out)
    drift = (max(rates) - min(rates)) / max(rates) * 100
    print(f"soak: {total} batches x {batch} = {total * batch} images; "
          f"mean {np.mean(rates):.0f} img/s, min {min(rates):.0f}, "
          f"max {max(rates):.0f} (spread {drift:.1f}%), "
          f"finite={bool(np.isfinite(final).all())}")


if __name__ == "__main__":
    main()
