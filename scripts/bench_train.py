"""Perf PROBE: training-step time per batch across backward implementations.

Round 2 left training on the per-op XLA forward (the fused kernels had no
VJP); round 3 added a custom VJP for the whole fused encoder layer
(ops/fused_block.fused_encoder_layer_trainable). This measures the three
training paths on the real chip:

  xla    — per-op XLA forward, autodiff backward
  flash  — Pallas packed attention in both directions (custom VJP)
  fused  — whole encoder layer as ONE Pallas kernel in both directions
           (rematerializing fused backward; x is the only residual/layer)

Usage: python scripts/bench_train.py [config] [batch] [iters]

AUG=1 adds the --augment probe: measures the HOST-side cost of the full
DeiT-style input pipeline (augment.augmented_dataset: RRC + flip +
RandAugment + normalize + mixup) and reports whether prefetcher_depth x
augment_throughput covers each measured step rate (the chip must never
starve; VERDICT r3 #3's measurement gate).
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import get_config
from vit_with_opencl_tpu.engine import enable_compilation_cache
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.parallel import spmd


def main():
    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_b_16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    cfg = get_config(name)
    mesh = spmd.make_mesh(data=1, model=1)

    # PARAM_DTYPE=bf16: halve master-weight memory — the single-chip mode
    # for ViT-G (fp32 masters + fp32 grad accumulator exceed 16 GB HBM).
    pdt = (jnp.bfloat16 if os.environ.get("PARAM_DTYPE", "f32")
           in ("bf16", "bfloat16") else jnp.float32)
    params = jax.jit(lambda: vit.cheap_stacked_params(cfg, pdt))()
    images = jax.jit(
        lambda k: jax.random.normal(
            k, (batch, cfg.in_chans, cfg.img_size, cfg.img_size),
            jnp.float32)
    )(jax.random.key(0))
    labels = jnp.arange(batch) % cfg.num_classes
    np.asarray(params["patch_b"][:1])
    np.asarray(images[0, 0, 0, :1])

    # Forward-only FLOPs per image; training ~3x (fwd + 2x bwd GEMMs), the
    # rematerializing fused backward recomputes the forward: ~4x.
    gflop_fwd = cfg.flops_per_image / 1e9

    impls = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else (
        "xla", "flash", "fused")
    # grad_accum > 1 keeps the TRACED batch at batch/accum: besides the usual
    # memory scaling this slips under the tunnel relay's compile-helper limit
    # (fresh D=768 training programs at bs>=16 crash it; bs8 compiles fine).
    accum = int(os.environ.get("ACCUM", "1"))
    # UNROLL=depth replaces grad-through-while with a loop-free program —
    # the other known dodge for the same compile-helper crash.
    unroll = int(os.environ.get("UNROLL", "1"))
    # TUNE=1: consult the autotune cache's quant="train" entry (falls back
    # to the bf16 inference entry) — the same lookup Trainer(batch_size=)
    # performs; TUNE=0 (default) measures the shipped heuristics.
    tuning = None
    if os.environ.get("TUNE", "0") == "1":
        from vit_with_opencl_tpu.perf import autotune

        tuning = autotune.lookup(cfg, batch, jnp.bfloat16, quant="train")
        print(f"tuning: { {k: v for k, v in tuning.items() if not k.endswith('_ms')} }")
    results = {}
    for impl in impls:
        if impl.startswith(("fused_split", "flash_split", "staged_split")):
            # Host loop over per-layer-group VJP programs — trains ViT-L/H/G
            # through small compiled units on compile-limited targets where
            # the monolithic program crashes the compile helper
            # (parallel/split_step). "fused_split4" = 4 layers/program,
            # fused-kernel backward; "flash_split" = per-op layer with the
            # flash-attention VJP (the only route at ViT-G width).
            from vit_with_opencl_tpu.parallel import split_step

            bw = {"flash": "flash", "stage": "fused_staged"}.get(
                impl[:5], "fused")
            gsz = int(impl.split("split")[1] or "1")
            step = split_step.make_split_train_step(
                cfg, lr=1e-4, compute_dtype=jnp.bfloat16,
                layers_per_program=gsz, backward=bw, tuning=tuning)
        else:
            step = spmd.make_train_step(cfg, mesh, lr=1e-4,
                                        compute_dtype=jnp.bfloat16,
                                        attention_impl=impl,
                                        grad_accum=accum,
                                        scan_unroll=unroll, tuning=tuning)
        try:
            t0 = time.perf_counter()
            p, loss = step(params, images, labels)
            np.asarray(loss)
            compile_s = time.perf_counter() - t0
            # Warm steady state.
            p, loss = step(params, images, labels)
            np.asarray(loss)
            t0 = time.perf_counter()
            for _ in range(iters):
                p, loss = step(p, images, labels)
            np.asarray(loss)
        except Exception as e:  # noqa: BLE001 — OOM is a DATA POINT here:
            # the per-op backward materializes [B,H,T,T] fp32 score tensors
            # that the flash/fused custom VJPs never allocate.
            msg = str(e).split("\n")[0][:140]
            print(f"{impl:6s}: FAILED {type(e).__name__}: {msg}")
            continue
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[impl] = ms
        print(f"{impl:6s}: {ms:8.2f} ms/step  "
              f"({batch / ms * 1e3:7.0f} img/s, loss {float(loss):.4f}, "
              f"3x-fwd TF/s {3 * gflop_fwd * batch / ms:6.1f}, "
              f"compile {compile_s:.0f}s)")

    base = results.get("xla")
    for impl in ("flash", "fused"):
        if base and impl in results:
            print(f"{impl} vs xla: {(base / results[impl] - 1) * 100:+.1f}%")

    if os.environ.get("AUG", "0") == "1":
        _augment_probe(cfg, batch, results)


def _augment_probe(cfg, batch, step_results):
    """Host augmentation throughput vs chip step rate (single producer
    thread, the DevicePrefetcher topology). Reports img/s of the full
    augment pipeline and the starve margin per measured impl."""
    from vit_with_opencl_tpu import augment

    rng = np.random.default_rng(0)
    # Source images at the torchvision 256/224-scaled resolution (what an
    # ImageNet loader would hand the transform stage).
    src = round(cfg.img_size * 256 / 224)
    n_src = max(batch, 64)
    images = rng.integers(0, 256, (n_src, src, src, 3), dtype=np.uint8)
    labels = rng.integers(0, cfg.num_classes, n_src)
    # Warm one batch (first-touch page faults), then time whole batches.
    rates = {}
    for mix in ("host", "device"):
        it = augment.augmented_dataset(
            images, labels, batch, cfg.num_classes, img_size=cfg.img_size,
            epochs=None, seed=0, mix=mix)
        next(it)
        n_batches = 4
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
        rates[mix] = n_batches * batch / dt
        print(f"augment(mix={mix:6s}): {dt / n_batches * 1e3:8.2f} ms/batch "
              f"({rates[mix]:7.0f} img/s host, 1 producer thread)")
    aug_rate = rates["device"]  # the recommended config: mix on chip
    cores = os.cpu_count() or 1
    for impl, ms in step_results.items():
        step_rate = batch / ms * 1e3
        margin = aug_rate / step_rate
        need = int(np.ceil(step_rate / aug_rate))
        verdict = "feeds chip" if margin >= 1.0 else (
            f"STARVES chip — needs workers={need} fork-pool producers "
            f"(augmented_dataset(workers=N)); this host has {cores} core"
            f"{'s' if cores != 1 else ''}"
            + ("" if cores >= need else " — UNDER-PROVISIONED: use a"
               " bigger-host loader or offline augmentation"))
        print(f"  vs {impl:6s}: aug/step rate {margin:5.2f}x  ({verdict})")
    if cores > 1:
        # Validate the fork-pool scaling claim where the host can: remeasure
        # the device-mix pipeline at min(need, cores) workers.
        w = min(max(int(np.ceil(max(
            batch / ms * 1e3 for ms in step_results.values()) / aug_rate)),
            2), cores)
        it = augment.augmented_dataset(
            images, labels, batch, cfg.num_classes, img_size=cfg.img_size,
            epochs=None, seed=0, mix="device", workers=w)
        next(it)
        t0 = time.perf_counter()
        for _ in range(4):
            next(it)
        dt = time.perf_counter() - t0
        print(f"augment(mix=device, workers={w}): {dt / 4 * 1e3:8.2f} "
              f"ms/batch ({4 * batch / dt:7.0f} img/s)")


if __name__ == "__main__":
    main()
