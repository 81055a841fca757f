"""Diagnose which D=768 programs the relay's compile helper can build.

Round-3 observation: every FRESH ViT-B (D=768) *training* compile returns
HTTP 500 ("tpu_compile_helper subprocess exit code 1") from the tunnel's
remote-compile service while D<=384 training and previously-cached D=768
inference programs run fine. This sweeps program classes from small to
large to find the boundary: fresh inference fwd, fwd+loss, grad of the
encoder tail, full training step at tiny batch.

Usage: python scripts/probe_relay_compile.py [stage ...]
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
from vit_with_opencl_tpu.parallel import spmd


def run(tag, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        print(f"{tag}: OK ({time.time() - t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — the failure IS the data point
        msg = str(e).split("\n")[0][:120]
        print(f"{tag}: FAIL {type(e).__name__}: {msg} "
              f"({time.time() - t0:.0f}s)", flush=True)


def main():
    enable_compilation_cache()
    stages = sys.argv[1:] or ["fwd", "loss", "encgrad", "train8"]
    cfg = get_config("vit_b_16_224")
    params = jax.jit(lambda: vit.cheap_stacked_params(cfg, jnp.float32))()
    np.asarray(params["patch_b"][:1])

    if "fwd" in stages:
        # Novel batch size → guaranteed fresh compile of the inference path.
        x = jnp.ones((96, 3, 224, 224), jnp.float32)
        run("fresh-fwd-bs96", lambda: jax.jit(
            lambda im, p: vit.forward(im, p, cfg,
                                      compute_dtype=jnp.bfloat16)
        )(x, params))

    if "loss" in stages:
        x = jnp.ones((96, 3, 224, 224), jnp.float32)
        y = jnp.arange(96) % 1000

        def loss(p, im, lab):
            logits = vit.forward(im, p, cfg, compute_dtype=jnp.bfloat16,
                                 return_logits=True)
            lp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(lp, lab[:, None], 1))

        run("fresh-fwd+loss-bs96", lambda: jax.jit(loss)(params, x, y))

    if "encgrad" in stages:
        # Gradient of the ENCODER only (no patchify/head): the scan bwd.
        ks = vit.resolve_kernels("xla")
        run("fresh-encoder-grad-bs8", lambda: jax.jit(jax.grad(
            lambda lp_, h: jnp.sum(vit.encoder(
                h, {"layers": lp_}, cfg, ks).astype(jnp.float32))
        ))(params["layers"], jnp.ones((8, 197, 768), jnp.bfloat16)))

    if "train8" in stages:
        mesh = spmd.make_mesh(data=1, model=1)
        step = spmd.make_train_step(cfg, mesh, lr=1e-4,
                                    compute_dtype=jnp.bfloat16,
                                    attention_impl="flash")
        x = jnp.ones((8, 3, 224, 224), jnp.float32)
        y = jnp.arange(8) % 1000
        run("fresh-train-flash-bs8", lambda: step(params, x, y)[1])


if __name__ == "__main__":
    main()
