"""Perf PROBE (not a correctness path): where does ViT-Tiny's time go?

Thin CLI over ``perf.profiler.attribute_forward`` — substitution-based
attribution of the real fused forward (identity GELU; softmax replaced by
a constant row scale) plus the implied pure-GEMM effective TF/s.

Usage: python scripts/probe_tiny_bound.py [batch] [iters] [config] [quant]

``quant=int8-w8a8`` attributes the W8A8 path instead: params are
quantized, the GEMMs run int8, and the report adds the dynamic-quantization
share (absmax/scale/round VPU work isolated by a constant-scale convert
substitution). The skeleton line is then the pure int8-GEMM bound.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import ViTConfig, get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.perf import profiler


def main():
    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    name = sys.argv[3] if len(sys.argv) > 3 else "vit_tiny_16_224"
    quant = sys.argv[4] if len(sys.argv) > 4 else None
    if quant not in (None, "int8", "int8-w8a8"):
        raise SystemExit(f"unknown quant mode {quant!r} "
                         "(use int8 or int8-w8a8)")
    if name == "d512":
        # Same synthetic mid-size preset as probe_midsize.py.
        cfg = ViTConfig(name="d512", embed_dim=512, depth=12, num_heads=8)
    else:
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

    a = profiler.attribute_forward(cfg, params, images, iters=iters,
                                   quant=quant)
    print(f"baseline          : {a['total_ms']:8.2f} ms/batch  "
          f"{batch / a['total_ms'] * 1e3:9.0f} img/s")
    print(f"GELU share        : {a['gelu_share'] * 100:5.1f}%  "
          f"({a['gelu_ms']:.2f} ms)")
    print(f"softmax share     : {a['softmax_share'] * 100:5.1f}%  "
          f"({a['softmax_ms']:.2f} ms)")
    if "quantize_share" in a:
        print(f"quantize share    : {a['quantize_share'] * 100:5.1f}%  "
              f"({a['quantize_ms']:.2f} ms)")
    print(f"GEMM skeleton     : {a['gemm_skeleton_ms']:8.2f} ms/batch  "
          f"(VPU total share {a['vpu_share'] * 100:5.1f}%)")
    flops = cfg.flops_per_image * batch
    print(f"skeleton implies  : "
          f"{flops / (a['gemm_skeleton_ms'] / 1e3) / 1e12:6.1f} TF/s "
          f"effective on the same FLOP count")


if __name__ == "__main__":
    main()
