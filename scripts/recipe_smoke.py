"""On-chip DeiT-recipe smoke (VERDICT r4 #3, second half): the FULL
training recipe end-to-end on real hardware —

    raw uint8 loader (augment_device.raw_batches)
      → on-chip RRC + flip + RandAugment + normalize (device_augment,
        fused into the step)
      → on-chip Mixup/CutMix with soft labels (device_mixup_cutmix)
      → train step (bf16 compute, flash attention VJP)
      → EMA shadow weights → EMA eval/export path

and the cost accounting, twice: (a) end-to-end through Trainer.fit
(includes host->device wire — on this tunneled runtime the fp32 input
stream is the bottleneck: 77 MB/batch at ~40 MB/s vs 25 MB raw uint8),
and (b) device-resident (batches staged once, jitted steps chained,
one fence) — the TRUE on-chip price of fusing the pixel pipeline into
the step, vs the 4 ms/img of host producer CPU it replaces (BENCH.md
round 5 augment table).

Usage: python scripts/recipe_smoke.py [config] [batch] [steps]
UNROLL=12 for vit_b-width grad-through-scan on the tunneled relay.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import augment_device, get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.parallel import spmd
from vit_with_opencl_tpu.train import Trainer


def fence(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def main():
    if os.environ.get("SMOKE_CPU"):  # off-chip trial (env var alone does
        jax.config.update("jax_platforms", "cpu")  # not stick — CLAUDE.md)
    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_b_16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    unroll = int(os.environ.get("UNROLL", "1"))
    cfg = get_config(name)
    mesh = spmd.make_mesh(data=1, model=1)

    rng = np.random.default_rng(0)
    src = round(cfg.img_size * 256 / 224)
    n = batch * 2
    raw = rng.integers(0, 256, (n, src, src, 3), dtype=np.uint8)
    labels = rng.integers(0, cfg.num_classes, n)

    common = dict(mesh=mesh, lr=1e-3, optimizer="adamw",
                  compute_dtype=jnp.bfloat16, attention_impl="flash",
                  scan_unroll=unroll, log_every=0)

    # --- full recipe: on-chip augment + mixup + EMA --------------------
    tr = Trainer(cfg, device_augment={}, mixup={"prob": 1.0},
                 ema_decay=0.999, **common)
    t0 = time.perf_counter()
    tr.fit(augment_device.raw_batches(raw, labels, batch, epochs=None,
                                      seed=1), steps=1)
    fence(tr.params)
    print(f"recipe compile+first step: {time.perf_counter() - t0:.0f}s "
          f"(loss {tr.last_loss:.4f})")
    t0 = time.perf_counter()
    tr.fit(augment_device.raw_batches(raw, labels, batch, epochs=None,
                                      seed=2), steps=tr.step_idx + steps)
    fence(tr.params)
    ms_recipe = (time.perf_counter() - t0) / steps * 1e3
    print(f"recipe step (augment+mixup+EMA on chip): {ms_recipe:8.2f} "
          f"ms/step ({batch / ms_recipe * 1e3:6.0f} img/s, "
          f"loss {tr.last_loss:.4f})")
    assert np.isfinite(tr.last_loss)

    # EMA eval path: shadow weights are fp32, finite, and usable.
    ema_leaf = np.asarray(jax.tree.leaves(tr.ema_params)[0])
    assert np.isfinite(ema_leaf).all()
    print(f"EMA shadow: {len(jax.tree.leaves(tr.ema_params))} leaves, "
          f"fp32={ema_leaf.dtype == np.float32}")

    # --- bare step on pre-augmented fp32 batches (the old input path) --
    pre = rng.normal(0, 1, (n, cfg.in_chans, cfg.img_size,
                            cfg.img_size)).astype(np.float32)
    tb = Trainer(cfg, ema_decay=0.999, **common)
    from vit_with_opencl_tpu import data as data_mod

    tb.fit(data_mod.memory_dataset(pre, labels, batch, epochs=None,
                                   seed=1), steps=1)
    fence(tb.params)
    t0 = time.perf_counter()
    tb.fit(data_mod.memory_dataset(pre, labels, batch, epochs=None,
                                   seed=2), steps=tb.step_idx + steps)
    fence(tb.params)
    ms_bare = (time.perf_counter() - t0) / steps * 1e3
    print(f"bare step (pre-augmented fp32 in):       {ms_bare:8.2f} "
          f"ms/step ({batch / ms_bare * 1e3:6.0f} img/s)")
    print(f"end-to-end delta (incl. wire: uint8 ships "
          f"{batch * src * src * 3 / 2**20:.0f} MB/batch, fp32 "
          f"{batch * cfg.in_chans * cfg.img_size**2 * 4 / 2**20:.0f} MB): "
          f"{ms_recipe - ms_bare:+.2f} ms/step "
          f"({(ms_recipe / ms_bare - 1) * 100:+.1f}%)")

    # --- device-resident step timing (isolates the on-chip augment cost
    # from host->device wire, which dominates end-to-end on a tunneled
    # runtime: fp32 bs128@224 is 77 MB/batch over ~40 MB/s) ------------
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    img_u8 = jax.device_put(raw[:batch], sh)
    img_f32 = jax.device_put(pre[:batch], sh)
    lbl = jax.device_put(labels[:batch], sh)

    def timed_chain(step_fn, params, opt, ema, ema_fn, n):
        loss = None
        for i in range(n):
            params, opt, loss = step_fn(params, opt, i)
            ema = ema_fn(ema, params)
        fence(loss)
        return params, opt, ema

    def measure(tr_obj, step_fn, label):
        p, o, e = tr_obj.params, tr_obj.opt_state, tr_obj.ema_params
        p, o, e = timed_chain(step_fn, p, o, e, tr_obj._ema_update, 2)
        t0 = time.perf_counter()
        timed_chain(step_fn, p, o, e, tr_obj._ema_update, steps)
        ms = (time.perf_counter() - t0) / steps * 1e3
        print(f"{label}: {ms:8.2f} ms/step "
              f"({batch / ms * 1e3:6.0f} img/s)")
        return ms

    ms_r = measure(
        tr, lambda p, o, i: tr._mix_step(p, o, img_u8, lbl, i),
        "device-resident recipe step (aug+mix+EMA)")
    ms_b = measure(
        tb, lambda p, o, i: tb._step(p, o, img_f32, lbl),
        "device-resident bare step   (fp32 in)    ")
    print(f"true on-chip pixel-pipeline cost: {ms_r - ms_b:+.2f} ms/step "
          f"({(ms_r / ms_b - 1) * 100:+.1f}%, "
          f"{(ms_r - ms_b) / batch * 1e3:+.0f} us/img) — replaces "
          f"4 ms/img (= {4.0 * batch:.0f} ms/batch) of host producer CPU")


if __name__ == "__main__":
    main()
