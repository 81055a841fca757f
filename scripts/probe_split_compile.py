"""Which of the split training step's five programs does the relay's
compile helper reject? (extends probe_relay_compile.py to the program-split
path, VERDICT r3 #5)

Lowers and compiles each program standalone — no execution — so one crash
doesn't poison the queue for the rest, and reports per-program verdicts.

Usage: python scripts/probe_split_compile.py [config] [batch] [G] [backward]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from vit_with_opencl_tpu import get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.parallel import split_step


def main():
    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_l_16_384"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    gsz = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    backward = sys.argv[4] if len(sys.argv) > 4 else "fused"
    cfg = get_config(name)
    step = split_step.make_split_train_step(
        cfg, lr=1e-4, compute_dtype=jnp.bfloat16, layers_per_program=gsz,
        backward=backward)

    cdt = jnp.bfloat16
    params = jax.eval_shape(
        lambda: vit.cheap_stacked_params(cfg, jnp.float32))
    rest = {k: v for k, v in params.items() if k != "layers"}
    layers = params["layers"]
    t, d = cfg.num_tokens, cfg.embed_dim
    x = jax.ShapeDtypeStruct((batch, t, d), cdt)
    images = jax.ShapeDtypeStruct(
        (batch, cfg.in_chans, cfg.img_size, cfg.img_size), jnp.float32)
    labels = jax.ShapeDtypeStruct((batch,), jnp.int32)
    g = jax.ShapeDtypeStruct((), jnp.int32)
    xs = jax.ShapeDtypeStruct((gsz, batch, t, d), cdt)
    acc = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape, a.dtype if jnp.issubdtype(a.dtype, jnp.floating)
            else jnp.float32), layers)
    x2 = jax.ShapeDtypeStruct((batch, t, d), jnp.float32)
    hid = jax.ShapeDtypeStruct((batch, t, cfg.hidden_dim), cdt)
    dlp_raw = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct((1,) + a.shape[1:], jnp.float32),
        layers)
    lp_s = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), layers)
    args = {
        "stem_fwd": (images, rest),
        "grp_fwd": (x, layers, g),
        "head_fwd_bwd": (x, rest, labels),
        "grp_bwd": (xs, layers, g, x, acc),
        "stem_bwd": (images, rest, x),
        "update": (params, acc, rest, rest),
        "slice_layer": (layers, g),
        "bwd_x2": (x, lp_s),
        "bwd_mlp_mono": (x2, x, lp_s),
        "bwd_mlp_light": (x2, x, lp_s),
        "bwd_mlp_wgrad": (x2, x, hid, hid, lp_s),
        "bwd_attn": (x, x2, lp_s),
        "scatter": (dlp_raw, acc, g),
    }
    for pname in step.programs:
        a = args[pname]
        fn = step.programs[pname]
        t0 = time.perf_counter()
        try:
            fn.lower(*a).compile()
            print(f"{pname:14s}: OK    ({time.perf_counter() - t0:6.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — the crash IS the data point
            msg = str(e).split("\n")[0][:120]
            print(f"{pname:14s}: FAIL  ({time.perf_counter() - t0:6.1f}s) "
                  f"{type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
