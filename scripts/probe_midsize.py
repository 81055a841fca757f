"""Perf PROBE: mid-size configs (D=384-512) — per-op vs fused kernels.

For each config, times the full jitted forward three ways on the live
backend:
  * per-op   — flash packed attention + XLA GEMMs (supports() forced False)
  * fused    — per-layer fused block (supports() forced True, stack off)
  * stack    — whole-encoder fused kernel (supports_stack forced True)
and prints ms/batch + img/s for each. Used to set the measured gating caps
in ops/fused_block.py.

Usage: python scripts/probe_midsize.py [config] [batch] [iters] [variants]
  variants: comma list from {perop,fused,stack}; default all
  config 'd512' is a synthetic D=512/depth-12/8-head preset.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import ViTConfig, get_config
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.ops import fused_block


def timed_forward(images, params, cfg, iters, group_size=None, ipc=None):
    kern = vit.resolve_kernels("flash")
    if group_size:
        kern["fused_group_size"] = group_size
    if ipc:
        kern["fused_block_ipc"] = ipc
    # params as explicit jit args (NOT closure constants — closed-over
    # arrays get serialized into the program and trip the relay's 413
    # size limit on big models).
    fwd = jax.jit(
        lambda im, p: vit.forward(im, p, cfg,
                                  compute_dtype=jnp.bfloat16, kernels=kern)
    )
    out = fwd(images, params)
    np.asarray(out.ravel()[:1])  # warm + fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(images, params)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main():
    from vit_with_opencl_tpu.engine import enable_compilation_cache

    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_s_16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    wanted = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ["perop", "fused", "stack"])
    if name == "d512":
        cfg = ViTConfig(name="d512", embed_dim=512, depth=12, num_heads=8)
    else:
        cfg = get_config(name)
    params = vit.cheap_stacked_params(cfg)
    qparams = None
    r = np.random.default_rng(0)
    images = jnp.asarray(
        r.standard_normal((batch, 3, cfg.img_size, cfg.img_size)) * 0.3,
        dtype=jnp.bfloat16,
    )
    flops = cfg.flops_per_image * batch

    real_sup, real_stk = fused_block.supports, fused_block.supports_stack
    real_layer = fused_block.fused_encoder_layer
    variants = {
        "perop": (lambda *a, **k: False, lambda *a, **k: False),
        "fused": (lambda *a, **k: True, lambda *a, **k: False),
        "fusedflat": (lambda *a, **k: True, lambda *a, **k: False),
        "int8perop": (lambda *a, **k: False, lambda *a, **k: False),
        "int8fused": (lambda *a, **k: True, lambda *a, **k: False),
        "fusedipc1": (lambda *a, **k: True, lambda *a, **k: False),
        "fusedipc4": (lambda *a, **k: True, lambda *a, **k: False),
        "group2": (lambda *a, **k: True, lambda *a, **k: False),
        "group3": (lambda *a, **k: True, lambda *a, **k: False),
        "group4": (lambda *a, **k: True, lambda *a, **k: False),
        "stack": (lambda *a, **k: False, lambda *a, **k: True),
    }
    print(f"{cfg.name} bs{batch} ({flops / batch / 1e9:.1f} GFLOP/img)")
    for label in wanted:
        sup, stk = variants[label]
        fused_block.supports, fused_block.supports_stack = sup, stk
        fused_block.fused_encoder_layer = (
            fused_block.fused_encoder_layer_flat if label == "fusedflat"
            else real_layer)
        gs = int(label[5:]) if label.startswith("group") else None
        ipc = int(label[8:]) if label.startswith("fusedipc") else None
        p_run = params
        if label.startswith("int8"):
            if qparams is None:
                from vit_with_opencl_tpu.models import quant

                host = jax.tree.map(lambda a: np.asarray(a, np.float32),
                                    params)
                qparams = jax.device_put(
                    quant.quantize_stacked_params(host, cfg))
            p_run = qparams
        try:
            dt = timed_forward(images, p_run, cfg, iters, group_size=gs,
                               ipc=ipc)
        except Exception as e:  # noqa: BLE001 — probe reports, doesn't die
            print(f"  {label:6s}: FAILED {type(e).__name__}: {e}"[:200])
            continue
        finally:
            fused_block.supports, fused_block.supports_stack = (
                real_sup, real_stk)
            fused_block.fused_encoder_layer = real_layer
        print(f"  {label:6s}: {dt * 1e3:8.2f} ms/batch  "
              f"{batch / dt:9.0f} img/s  {flops / dt / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
