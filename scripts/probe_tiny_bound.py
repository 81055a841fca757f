"""Perf PROBE (not a correctness path): where does ViT-Tiny's time go?

Times the full jitted forward with the whole-encoder stack kernel, then with
numerics-breaking substitutions (identity erf-GELU; softmax replaced by a
constant row scale) to attribute VPU share vs MXU share inside the fused
kernel. The substituted variants produce WRONG outputs on purpose — this
script only reads wall clock, never values.

Usage: python scripts/probe_tiny_bound.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import get_config
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.ops import attention, fused_block


def timed_forward(images, params, cfg, iters):
    kern = vit.resolve_kernels("flash")
    fwd = jax.jit(
        lambda im, p: vit.forward(im, p, cfg,
                                  compute_dtype=jnp.bfloat16, kernels=kern)
    )
    out = fwd(images, params)
    np.asarray(out.ravel()[:1])  # warm + fence (block_until_ready lies here)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(images, params)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    from vit_with_opencl_tpu.engine import enable_compilation_cache

    enable_compilation_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cfg = get_config("vit_tiny_16_224")
    params = vit.cheap_stacked_params(cfg)
    r = np.random.default_rng(0)
    images = jnp.asarray(
        r.standard_normal((batch, 3, cfg.img_size, cfg.img_size)) * 0.3,
        dtype=jnp.bfloat16,
    )

    base = timed_forward(images, params, cfg, iters)
    print(f"baseline          : {base * 1e3:8.2f} ms/batch  "
          f"{batch / base:9.0f} img/s")

    # --- variant: erf-GELU -> identity (removes exp+poly VPU work) ---------
    real_gelu = fused_block._gelu_fast
    fused_block._gelu_fast = lambda x: x
    try:
        no_gelu = timed_forward(images, params, cfg, iters)
    finally:
        fused_block._gelu_fast = real_gelu
    print(f"no erf-GELU       : {no_gelu * 1e3:8.2f} ms/batch  "
          f"(GELU share {(base - no_gelu) / base * 100:5.1f}%)")

    # --- variant: softmax -> constant row scale (keeps both GEMMs) ---------
    real_head = attention._head_attention

    def fake_head(q, k, v, scale, neg=None):
        qs = q * jnp.asarray(scale, q.dtype)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = jax.lax.dot(
            (s * (1.0 / s.shape[1])).astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return o, s

    attention._head_attention = fake_head
    try:
        no_sm = timed_forward(images, params, cfg, iters)
    finally:
        attention._head_attention = real_head
    print(f"no softmax        : {no_sm * 1e3:8.2f} ms/batch  "
          f"(softmax share {(base - no_sm) / base * 100:5.1f}%)")

    # --- variant: both out — the pure-GEMM skeleton ------------------------
    fused_block._gelu_fast = lambda x: x
    attention._head_attention = fake_head
    try:
        skel = timed_forward(images, params, cfg, iters)
    finally:
        fused_block._gelu_fast = real_gelu
        attention._head_attention = real_head
    print(f"GEMM skeleton     : {skel * 1e3:8.2f} ms/batch  "
          f"(VPU total share {(base - skel) / base * 100:5.1f}%)")

    flops = cfg.flops_per_image * batch
    print(f"skeleton implies  : {flops / skel / 1e12:6.1f} TF/s effective "
          f"on the same FLOP count")


if __name__ == "__main__":
    main()
