"""Print the trace-derived per-kernel DEVICE-time table for a config.

The TPU equivalent of the reference's (disabled) CL_PROFILING event report
(ViT_opencl.c:988-1048): runs the production jitted forward under
jax.profiler and aggregates the device op spans (perf/kernel_trace.py).

Usage: python scripts/trace_table.py [config] [batch] [iters] [top] [quant]
(quant: "int8-w8a8" / "int8" traces the quantized production path)
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.perf import kernel_trace


def main():
    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_b_16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    top = int(sys.argv[4]) if len(sys.argv) > 4 else 15
    quant = sys.argv[5] if len(sys.argv) > 5 else None
    if quant not in (None, "int8", "int8-w8a8"):
        raise SystemExit(f"unknown quant mode {quant!r} "
                         "(use int8 or int8-w8a8)")
    cfg = get_config(name)
    if quant:
        from vit_with_opencl_tpu.models import quant as quantlib

        params = jax.jit(lambda: quantlib.quantize_stacked_params_device(
            vit.cheap_stacked_params(cfg, jnp.bfloat16), cfg))()
    else:
        params = jax.jit(
            lambda: vit.cheap_stacked_params(cfg, jnp.bfloat16))()
    images = jax.jit(
        lambda k: jax.random.normal(
            k, (batch, cfg.in_chans, cfg.img_size, cfg.img_size),
            jnp.float32)
    )(jax.random.key(0))
    np.asarray(params["patch_b"][:1]); np.asarray(images[0, 0, 0, :1])

    kernels = vit.resolve_kernels("flash", w8a8=quant == "int8-w8a8")
    if cfg.head_type == "none":
        # Bare tower (CLIP): trace feature extraction, as bench.py does.
        fwd = jax.jit(lambda im, p: vit.forward_features(
            im, p, cfg, compute_dtype=jnp.bfloat16, kernels=kernels)[:, 0])
    else:
        fwd = jax.jit(lambda im, p: vit.forward(
            im, p, cfg, compute_dtype=jnp.bfloat16, kernels=kernels))
    table = kernel_trace.device_kernel_table(fwd, (images, params),
                                             iters=iters, top=top)
    print(kernel_trace.format_kernel_table(table, iters=iters))


if __name__ == "__main__":
    main()
