"""Which stage of the fused-layer backward kills the relay compiler at D=768?

The batch ladder showed: flash training compiles at every batch size, the
fused path crashes the remote compile helper even at bs16, and the same
fused kernels compile fine at D<=384. This launches the three backward
Pallas stages ONE AT A TIME at ViT-B shapes (b=4) so the crashing kernel
identifies itself.

Usage: python scripts/probe_fused_bwd.py [stage ...]   (x2 mlp attn full)
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_with_opencl_tpu import get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.ops import fused_block as fb


def run(tag, fn, *args):
    t0 = time.time()
    try:
        out = jax.jit(fn)(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        print(f"{tag}: OK ({time.time() - t0:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:110]
        print(f"{tag}: FAIL {type(e).__name__}: {msg} "
              f"({time.time() - t0:.0f}s)", flush=True)


def main():
    enable_compilation_cache()
    stages = sys.argv[1:] or ["x2", "mlp", "attn", "full"]
    # PROBE_CFG/PROBE_B widen the hunt (round 4: grp_bwd 500s at D>=1024
    # where D=768 compiles — which stage stops scaling?).
    import os

    cfg = get_config(os.environ.get("PROBE_CFG", "vit_b_16_224"))
    b, t, d = int(os.environ.get("PROBE_B", "4")), cfg.num_tokens, cfg.embed_dim
    hdim = cfg.hidden_dim
    params = jax.jit(lambda: vit.cheap_stacked_params(cfg, jnp.float32))()
    np.asarray(params["patch_b"][:1])
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    g = jax.tree.map(lambda a: a[None], lp)
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, t, d), jnp.bfloat16)
    dout = jax.random.normal(key, (b, t, d), jnp.bfloat16)
    x2f = jax.random.normal(key, (b, t, d), jnp.float32)

    cell = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    attn_keys = ("ln1_w", "ln1_b", "qkv_w", "qkv_b", "out_w", "out_b")
    mlp_keys = ("ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b")
    attn_specs, attn_ops = fb._wspec_ops(g, attn_keys, d, hdim, x)
    mlp_specs, mlp_ops = fb._wspec_ops(g, mlp_keys, d, hdim, x)
    grad_shape = {k: (1,) + np.shape(lp[k]) for k in attn_keys + mlp_keys}
    cp1 = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=80 << 20)

    if "x2" in stages:
        run("attn-half-fwd", lambda xx, *ops: pl.pallas_call(
            functools.partial(
                fb._attn_half_fwd_kernel, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.eps, images_per_cell=1),
            grid=(b,), in_specs=[cell] + attn_specs, out_specs=cell,
            out_shape=jax.ShapeDtypeStruct((b, t, d), jnp.float32),
            compiler_params=cp1, interpret=False,
        )(xx, *ops), x, *attn_ops)

    if "mlp" in stages:
        run("mlp-bwd", lambda xx, dd, *ops: pl.pallas_call(
            functools.partial(fb._mlp_bwd_kernel, eps=cfg.eps,
                              cdt=jnp.bfloat16, images_per_cell=1),
            grid=(b,),
            in_specs=[cell, cell] + mlp_specs,
            out_specs=[cell] + [fb._whole(grad_shape[k]) for k in mlp_keys],
            out_shape=[jax.ShapeDtypeStruct((b, t, d), jnp.float32)]
            + [jax.ShapeDtypeStruct(grad_shape[k], jnp.float32)
               for k in mlp_keys],
            compiler_params=cp1, interpret=False,
        )(xx, dd, *ops), x2f, dout, *mlp_ops)

    if "attn" in stages:
        run("attn-bwd", lambda xx, dd, *ops: pl.pallas_call(
            functools.partial(
                fb._attn_bwd_kernel, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.eps, images_per_cell=1),
            grid=(b,),
            in_specs=[cell, cell] + attn_specs,
            out_specs=[cell] + [fb._whole(grad_shape[k]) for k in attn_keys],
            out_shape=[jax.ShapeDtypeStruct((b, t, d), jnp.bfloat16)]
            + [jax.ShapeDtypeStruct(grad_shape[k], jnp.float32)
               for k in attn_keys],
            compiler_params=cp1, interpret=False,
        )(xx, dd, *ops), x, dout, *attn_ops)

    if "attnf32" in stages:  # production passes dx2 as fp32 — the real case
        run("attn-bwd-f32dx2", lambda xx, dd, *ops: pl.pallas_call(
            functools.partial(
                fb._attn_bwd_kernel, num_heads=cfg.num_heads,
                head_dim=cfg.head_dim, eps=cfg.eps, images_per_cell=1),
            grid=(b,),
            in_specs=[cell, cell] + attn_specs,
            out_specs=[cell] + [fb._whole(grad_shape[k]) for k in attn_keys],
            out_shape=[jax.ShapeDtypeStruct((b, t, d), jnp.bfloat16)]
            + [jax.ShapeDtypeStruct(grad_shape[k], jnp.float32)
               for k in attn_keys],
            compiler_params=cp1, interpret=False,
        )(xx, dd, *ops), x, x2f, *attn_ops)

    if "full" in stages:
        run("full-bwd", lambda xx, ll, dd: fb.fused_encoder_layer_bwd(
            xx, ll, dd, cfg, interpret=False), x, lp, dout)

    if "light" in stages:  # the chunked path's light MLP backward alone
        hc_keys = ("ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w")
        light_specs, light_ops = fb._wspec_ops(g, hc_keys, d, hdim, x)
        hid_cell = pl.BlockSpec((1, t, hdim), lambda i: (i, 0, 0))
        small_keys = ("ln2_w", "ln2_b", "fc1_b", "fc2_b")
        run("mlp-light-bwd", lambda xx, dd, *ops: pl.pallas_call(
            functools.partial(fb._mlp_light_bwd_kernel, eps=cfg.eps,
                              cdt=jnp.bfloat16, images_per_cell=1),
            grid=(b,),
            in_specs=[cell, cell] + light_specs,
            out_specs=[cell, hid_cell, hid_cell]
            + [fb._whole(grad_shape[k]) for k in small_keys],
            out_shape=[jax.ShapeDtypeStruct((b, t, d), jnp.float32),
                       jax.ShapeDtypeStruct((b, t, hdim), jnp.bfloat16),
                       jax.ShapeDtypeStruct((b, t, hdim), jnp.bfloat16)]
            + [jax.ShapeDtypeStruct(grad_shape[k], jnp.float32)
               for k in small_keys],
            compiler_params=cp1, interpret=False,
        )(xx, dd, *ops), x2f, dout, *light_ops)

    if "wgrad" in stages:  # the chunked path's H-chunked weight-grad kernel
        chunks = fb._pick_mlp_chunks(d, hdim, 2)
        hc = hdim // chunks
        hid_s = jax.random.normal(key, (b, t, hdim), jnp.bfloat16)
        dhp_s = jax.random.normal(key, (b, t, hdim), jnp.bfloat16)
        run(f"mlp-wgrad(chunks={chunks})", lambda *ops: pl.pallas_call(
            functools.partial(fb._mlp_wgrad_kernel, eps=cfg.eps,
                              cdt=jnp.bfloat16, images_per_cell=1),
            grid=(chunks, b),
            in_specs=[
                pl.BlockSpec((1, t, d), lambda h, i: (i, 0, 0)),
                pl.BlockSpec((1, t, d), lambda h, i: (i, 0, 0)),
                pl.BlockSpec((1, t, hc), lambda h, i: (i, 0, h)),
                pl.BlockSpec((1, t, hc), lambda h, i: (i, 0, h)),
                pl.BlockSpec((1, d), lambda h, i: (0, 0)),
                pl.BlockSpec((1, d), lambda h, i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, d, hc), lambda h, i: (0, 0, h)),
                pl.BlockSpec((1, hc, d), lambda h, i: (0, h, 0)),
            ],
            out_shape=[jax.ShapeDtypeStruct((1, d, hdim), jnp.float32),
                       jax.ShapeDtypeStruct((1, hdim, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=80 << 20),
            interpret=False,
        )(*ops), x2f, dout, hid_s, dhp_s, g["ln2_w"], g["ln2_b"])

    if "full1" in stages:  # force the monolithic MLP kernel (no light/wgrad)
        run("full-bwd-mlpchunks1", lambda xx, ll, dd: fb.fused_encoder_layer_bwd(
            xx, ll, dd, cfg, interpret=False, mlp_chunks=1), x, lp, dout)


def scan_stages():
    """Escalation: grad through scan(fused trainable layer), then the full
    model loss — finds the context that crashes the relay compiler."""
    enable_compilation_cache()
    cfg = get_config("vit_b_16_224")
    stages = sys.argv[2:] or ["scan", "model"]
    params = jax.jit(lambda: vit.cheap_stacked_params(cfg, jnp.float32))()
    np.asarray(params["patch_b"][:1])
    key = jax.random.key(0)

    if "scan" in stages:
        x = jax.random.normal(key, (4, cfg.num_tokens, cfg.embed_dim),
                              jnp.bfloat16)

        def loss(layers, xx):
            def body(h, lp):
                return fb.fused_encoder_layer_trainable(h, lp, cfg), None
            out, _ = jax.lax.scan(body, xx, layers)
            return jnp.sum(out.astype(jnp.float32))

        run("grad-scan-fused-12L", lambda ll, xx: jax.grad(loss)(ll, xx),
            params["layers"], x)

    if "model" in stages:
        from vit_with_opencl_tpu.parallel import spmd
        mesh = spmd.make_mesh(data=1, model=1)
        step = spmd.make_train_step(cfg, mesh, lr=1e-4,
                                    compute_dtype=jnp.bfloat16,
                                    attention_impl="fused")
        xi = jnp.ones((4, 3, 224, 224), jnp.float32)
        yi = jnp.arange(4) % 1000
        run("train-step-fused-bs4", lambda p, a, b2: step(p, a, b2)[1],
            params, xi, yi)


if __name__ == "__main__":
    # One dispatch point: `scan` runs the escalation probe INSTEAD of the
    # kernel-stage probe (main() would otherwise jit full ViT-B params over
    # the relay for nothing before scan_stages repeated the same setup).
    if len(sys.argv) > 1 and sys.argv[1] == "scan":
        scan_stages()
    else:
        main()
