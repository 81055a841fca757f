"""Headline benchmark: ViT-B/16 @224 inference throughput on one chip
(W8A8 dynamic int8 by default; BENCH_QUANT=bf16 for the bf16 path).

Prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": "images/sec",
   "vs_baseline": fraction of the BASELINE target (90% of v5e bf16 roofline),
   "vs_measured": fraction of the SAME target recomputed against the chip's
   measured (not spec) peak, "calibration": {...}}

The reference publishes no numbers (BASELINE.md); the baseline is therefore
the roofline target from BASELINE.json: >=90% of peak-FLOPs-implied
images/sec for the ~35 GFLOP ViT-B/16 forward pass on v5e. The tunneled
preview chip sustains well below the 197 TF/s v5e spec on ANY pure GEMM
(measured ~127-131 TF/s), so the record carries both denominators: the spec
roofline (vs_baseline, honest about the paper target) and a fresh
same-methodology GEMM calibration (vs_measured, honest about the silicon).

Env knobs: BENCH_CONFIG (preset name), BENCH_BATCH, BENCH_ITERS,
BENCH_PARITY (default ON: runs a parity check vs the fp32 golden oracle and
folds the result INTO the JSON record so every recorded line is
self-certifying; =0 to skip), BENCH_CALIBRATE=0 (skip the measured-ceiling
GEMM sweep), BENCH_QUANT (int8-w8a8 default / int8-w8a8-outlier / int8 /
bf16). The outlier mode is the accuracy-defensible W8A8 (calibrated channel
permutations + bf16 outlier groups, models/quant.calibrate_w8a8) — plain
per-token-absmax W8A8 breaks the reference's 0.01 comparator gate on
trained-ViT outlier statistics (tests/test_quant_outlier.py); this measures
what the defensible mode costs on chip.
"""

import json
import os
import sys
import time


# v5e: 394 TFLOP/s bf16 per chip... no — v5e is 197 TFLOP/s bf16. Keep a map
# so other generations report a sane fraction.
PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def main():
    import jax
    import jax.numpy as jnp

    from vit_with_opencl_tpu.engine import enable_compilation_cache

    enable_compilation_cache()

    from vit_with_opencl_tpu import get_config
    from vit_with_opencl_tpu.models import vit

    cfg = get_config(os.environ.get("BENCH_CONFIG", "vit_b_16_224"))
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    attention_impl = os.environ.get("BENCH_ATTN", "flash")
    # Default headline is W8A8 dynamic quantization (round 3): int8 weights
    # AND per-token int8 activations on the MXU's double-rate int path.
    # Promoted to default because it passes the reference's own accuracy
    # contract with two orders to spare (max abs probability error vs the
    # fp32 golden oracle: 1.1e-4 at ViT-B scale vs the 0.01 comparator gate
    # Main.c applies — it even meets the 1e-3 budget we hold bf16 to).
    # BENCH_QUANT=bf16 forces the unquantized path; "int8" is weight-only.
    quant_mode = os.environ.get("BENCH_QUANT", "int8-w8a8")
    if quant_mode in ("", "none", "bf16"):
        quant_mode = None
    if quant_mode not in (None, "int8", "int8-w8a8", "int8-w8a8-outlier"):
        raise SystemExit(f"unknown BENCH_QUANT {quant_mode!r}")
    w8a8 = quant_mode in ("int8-w8a8", "int8-w8a8-outlier")
    outlier = quant_mode == "int8-w8a8-outlier"

    dev = jax.devices()[0]
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak_tflops = PEAK_BF16_TFLOPS.get(gen, 197.0)
    print(f"bench: {cfg.name} batch={batch} iters={iters} device={dev} "
          f"attn={attention_impl}", file=sys.stderr)

    import numpy as np

    # Params and inputs generated on device (no tunneled H2D of ~90M floats),
    # inside single jit programs with a cheap iota hash: per-op eager
    # dispatch, and threefry over 90M elements, both blow up compile time
    # under the tunneled runtime.
    if outlier:
        from vit_with_opencl_tpu.models import quant

        # Calibrated outlier-aware W8A8: calibration forward + plan-permute
        # + quantize all run ON DEVICE (calibrate_w8a8_device) — only the
        # [L, D]-sized stats cross the tunnel. Synthetic weights carry no
        # real outliers; the point of this mode's bench row is the
        # THROUGHPUT cost of the defensible kernels (bf16 hi-GEMMs + masked
        # context absmax), which depends on shapes, not values.
        fp_params = jax.jit(
            lambda: vit.cheap_stacked_params(cfg, jnp.bfloat16))()
        calib_n = int(os.environ.get("BENCH_CALIB_IMAGES", "8"))
        calib = jax.jit(
            lambda k: jax.random.normal(
                k, (calib_n, cfg.in_chans, cfg.img_size, cfg.img_size),
                jnp.float32)
        )(jax.random.key(7))
        np.asarray(np.ravel(np.asarray(calib[0, 0, 0, :1])))
        t_cal = time.perf_counter()
        params = quant.calibrate_w8a8_device(calib, fp_params, cfg)
        print(f"device calibration (n={calib_n}): "
              f"{time.perf_counter() - t_cal:.1f}s", file=sys.stderr)
        del fp_params
    elif quant_mode:
        from vit_with_opencl_tpu.models import quant

        params = jax.jit(
            lambda: quant.quantize_stacked_params_device(
                vit.cheap_stacked_params(cfg, jnp.bfloat16), cfg)
        )()
    else:
        params = jax.jit(
            lambda: vit.cheap_stacked_params(cfg, jnp.bfloat16)
        )()
    images = jax.jit(
        lambda k: jax.random.normal(
            k, (batch, cfg.in_chans, cfg.img_size, cfg.img_size), jnp.float32
        )
    )(jax.random.key(1))
    # Force materialization with a real host fetch: under the tunneled axon
    # runtime jax.block_until_ready returns before execution completes, so
    # every timing boundary here is an actual device->host read (device
    # programs execute in submission order, so one small fetch fences
    # everything enqueued before it).
    t0 = time.perf_counter()
    np.asarray(params["patch_b"][:1])
    np.asarray(images[0, 0, 0, :1])
    print(f"param/input gen+materialize: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # Device-measured launch winners (autotune cache) — same consultation
    # the InferenceEngine does, so the bench measures the production
    # configuration (round 5: H-W8A8 wants ipc=1, G-W8A8 ipc=4, not the
    # shipped ipc=2 heuristic).
    from vit_with_opencl_tpu.perf import autotune

    tuning = autotune.lookup(
        cfg, batch, jnp.bfloat16,
        quant="int8-w8a8" if w8a8 else quant_mode)
    if tuning:
        knobs = {k: v for k, v in tuning.items()
                 if not isinstance(v, dict) and k not in
                 ("device", "timestamp")}
        print(f"autotune cache: {knobs}", file=sys.stderr)
    kernels = vit.resolve_kernels(attention_impl, tuning=tuning, w8a8=w8a8,
                                  heads=(cfg.num_heads, cfg.head_dim))
    if cfg.head_type == "none":
        # Bare tower (CLIP vision trunk): benchmark feature extraction.
        fwd = jax.jit(
            lambda im, p: vit.forward_features(
                im, p, cfg, compute_dtype=jnp.bfloat16, kernels=kernels
            )[:, 0]
        )
    else:
        fwd = jax.jit(
            lambda im, p: vit.forward(im, p, cfg, compute_dtype=jnp.bfloat16,
                                      kernels=kernels)
        )

    t0 = time.perf_counter()
    np.asarray(fwd(images, params)[0, :1])
    compile_s = time.perf_counter() - t0
    print(f"compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    # Warm run (steady-state caches).
    np.asarray(fwd(images, params)[0, :1])

    # Best of two timing loops in the SAME process: run-to-run jitter on
    # the tunneled relay is a few % (CLAUDE.md), and two loops cost ~2 s.
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fwd(images, params)
        np.asarray(out[0, :1])  # fence: forces all queued iterations
        elapsed = min(elapsed, time.perf_counter() - t0)

    imgs_per_sec = batch * iters / elapsed
    gflop = cfg.flops_per_image / 1e9
    achieved_tflops = imgs_per_sec * gflop / 1e3
    roofline_imgs = peak_tflops * 1e3 / gflop
    target = 0.9 * roofline_imgs
    print(
        f"{imgs_per_sec:.1f} images/sec, {achieved_tflops:.1f} TF/s achieved, "
        f"{gflop:.1f} GFLOP/img, roofline {roofline_imgs:.0f} img/s ({gen}), "
        f"MFU {achieved_tflops / peak_tflops * 100:.1f}%",
        file=sys.stderr,
    )
    # Measured-ceiling calibration (default ON; BENCH_CALIBRATE=0 skips).
    # Same methodology as the model loop above: jit once, warm run, queue
    # `iters` dispatches, fence with one host fetch. The ceiling is the best
    # TF/s over a few large GEMM shapes — the tunneled preview chip sustains
    # ~127-131 TF/s vs the 197 TF/s v5e spec, and the model's MFU is quoted
    # against both.
    calibration = None
    if os.environ.get("BENCH_CALIBRATE", "1") != "0":
        peak_meas = 0.0
        cal_iters = max(10, iters // 2)
        for mkn in ((8192, 8192, 8192), (4096, 16384, 8192)):
            m, k, n2 = mkn
            a = jax.jit(
                lambda: (jax.lax.broadcasted_iota(jnp.int32, (m, k), 1)
                         % 251).astype(jnp.bfloat16) * 0.01
            )()
            bmat = jax.jit(
                lambda: (jax.lax.broadcasted_iota(jnp.int32, (k, n2), 0)
                         % 253).astype(jnp.bfloat16) * 0.01
            )()
            np.asarray(a[0, :1]); np.asarray(bmat[0, :1])
            g = jax.jit(lambda x_, y_: jnp.dot(
                x_, y_, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16))
            o = g(a, bmat)
            np.asarray(o[0, :1])
            o = g(a, bmat)
            np.asarray(o[0, :1])
            t0 = time.perf_counter()
            for _ in range(cal_iters):
                o = g(a, bmat)
            np.asarray(o[0, :1])
            ms = (time.perf_counter() - t0) / cal_iters * 1e3
            tf = 2 * m * k * n2 / 1e9 / ms
            print(f"calibration GEMM {m}x{k}x{n2}: {tf:.1f} TF/s",
                  file=sys.stderr)
            peak_meas = max(peak_meas, tf)
        calibration = {
            "measured_peak_tflops": round(peak_meas, 1),
            "spec_peak_tflops": peak_tflops,
            "method": (f"best of bf16 GEMM shapes, jit+warm, {cal_iters}-iter "
                       "queued dispatch, host-fetch fence (same as model loop)"),
            "flop_convention": "matmul MACs*2 incl. attention scores/PV, "
                               "excl. LN/softmax/GELU",
        }
        if w8a8:
            # The W8A8 path runs its big GEMMs on the int8 MXU (2x spec
            # rate, ~1.79x measured) — quote vs_measured against an int8
            # ceiling measured the same way, not against the bf16 one.
            m = k = n2 = 8192

            def mk_i8(s):
                # salt closed over statically: iota's dimension arg must be
                # a Python int, not a traced value.
                return jax.jit(
                    lambda: (((jax.lax.broadcasted_iota(jnp.int32, (m, k),
                                                        s % 2)
                               * 16807 + s) % 251) - 125).astype(jnp.int8)
                )()

            a8, b8 = mk_i8(1), mk_i8(2)
            np.asarray(a8[0, :1]); np.asarray(b8[0, :1])
            g8 = jax.jit(lambda x_, y_: jax.lax.dot_general(
                x_, y_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32))
            o = g8(a8, b8); np.asarray(o[0, :1])
            o = g8(a8, b8); np.asarray(o[0, :1])
            t0 = time.perf_counter()
            for _ in range(cal_iters):
                o = g8(a8, b8)
            np.asarray(o[0, :1])
            tf8 = (2 * m * k * n2 * cal_iters / 1e12
                   / (time.perf_counter() - t0))
            calibration["measured_peak_tops_int8"] = round(tf8, 1)
            print(f"calibration int8 GEMM {m}x{k}x{n2}: {tf8:.1f} TOPS",
                  file=sys.stderr)
            # Under W8A8 only the four BLOCK linears (QKV/out/fc1/fc2) run
            # int8 — attention scores/PV, the patch embed, and the head all
            # stay bf16 (resolve_kernels: embed/head dequantize to bf16).
            # The honest ceiling is the harmonic mix of the two measured
            # rates weighted by FLOP share; it is the JSON's vs_measured
            # denominator and the stderr MFU below, so the two agree.
            t, d = cfg.num_tokens, cfg.embed_dim
            attn_fl = cfg.depth * 2 * (2 * t * t * d)
            patch_fl = 2 * cfg.num_patches * d * (
                cfg.in_chans * cfg.patch_size ** 2)
            head_fl = (0 if cfg.head_type == "none"
                       else 2 * d * cfg.num_classes)
            bf16_fl = attn_fl + patch_fl + head_fl
            if outlier:
                # The calibrated mode moves each GEMM's outlier-group rows
                # from the int8 to the bf16 MXU rate (default plan widths,
                # models/quant.plan_outliers): k_d input rows of qkv/fc1,
                # k_h of fc2, and kh-per-head context tails of out-proj.
                from vit_with_opencl_tpu.models import quant as _q

                k_d = _q._group_width(d)
                k_h = _q._group_width(cfg.hidden_dim)
                kh = max(2, cfg.head_dim // 8)
                bf16_fl += cfg.depth * 2 * t * (
                    k_d * 3 * d + k_d * cfg.hidden_dim
                    + k_h * d + cfg.num_heads * kh * d)
            bf16_frac = bf16_fl / cfg.flops_per_image
            mixed = 1.0 / ((1.0 - bf16_frac) / tf8
                           + bf16_frac / calibration["measured_peak_tflops"])
            calibration["bf16_flop_frac"] = round(bf16_frac, 4)
            calibration["measured_peak_mixed_tflops"] = round(mixed, 1)
            calibration["vs_measured_denominator"] = (
                "harmonic mix: int8 ceiling for the block linears, bf16 "
                "ceiling for attention scores/PV + patch embed + head")
            peak_meas = mixed
        print(f"measured chip peak: {peak_meas:.1f} TF/s "
              f"(MFU vs measured: {achieved_tflops / peak_meas * 100:.1f}%, "
              f"vs spec: {achieved_tflops / peak_tflops * 100:.1f}%)",
              file=sys.stderr)

    dtype_tag = quant_mode if quant_mode else "bf16"
    parity = None
    if os.environ.get("BENCH_PARITY", "1") != "0":
        # Default ON since round 5: the recorded JSON line carries its own
        # oracle check (the reference never reports a number without the
        # comparator running in the same binary — Main.c:54-90).
        from vit_with_opencl_tpu.harness import fixtures
        from vit_with_opencl_tpu.models import golden

        named = fixtures.random_params(cfg, seed=0, scale=0.02)
        pimgs = fixtures.random_images(cfg, n=2, seed=1)
        ref = golden.golden_forward(pimgs, named, cfg)
        stacked = vit.stack_params(named, cfg, param_dtype=jnp.bfloat16)
        if quant_mode:
            # Quantize for real — with fp weights the w8a8 kernels silently
            # fall back to the bf16 path and the check proves nothing. Gate
            # at the reference's own comparator tolerance (0.01 on probs,
            # Main.c answer comparison) rather than the bf16 1e-3 gate.
            from vit_with_opencl_tpu.models import quant

            if outlier:
                pcal = fixtures.random_images(cfg, n=4, seed=9)
                stacked = quant.calibrate_w8a8(pcal, stacked, cfg)
            else:
                stacked = quant.quantize_stacked_params(stacked, cfg)
            gate = 1e-2
        else:
            gate = 1e-3
        got = np.asarray(
            jax.jit(
                lambda im, p: vit.forward(im, p, cfg,
                                          compute_dtype=jnp.bfloat16,
                                          kernels=kernels)
            )(jnp.asarray(pimgs), stacked)
        )
        err = float(np.abs(got - ref).max())
        parity = {"max_abs_err_vs_golden": err, "gate": gate,
                  "ok": bool(err < gate)}
        print(f"parity ({dtype_tag}): max abs err vs golden = {err:.2e} "
              f"({'OK' if err < gate else 'FAIL'} vs {gate:g} gate)",
              file=sys.stderr)

    record = {
        "metric": f"images/sec/chip ({cfg.name}, {dtype_tag}, batch={batch})",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / target, 4),
        "achieved_tflops": round(achieved_tflops, 1),
    }
    if calibration is not None:
        # Same 90%-of-roofline target, with the roofline recomputed from the
        # chip's measured GEMM ceiling instead of the spec sheet. Under W8A8
        # the denominator is the harmonic-mix ceiling computed in the
        # calibration section above (larger than the bf16 ceiling, i.e. the
        # HARDER target) — the same number the stderr MFU line used.
        meas_peak = calibration.get("measured_peak_mixed_tflops",
                                    calibration["measured_peak_tflops"])
        measured_roofline = meas_peak * 1e3 / gflop
        record["vs_measured"] = round(imgs_per_sec / (0.9 * measured_roofline), 4)
        record["calibration"] = calibration
    if parity is not None:
        record["parity"] = parity
    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover
        # The tunneled TPU runtime occasionally poisons a process with
        # transient FailedPrecondition/INTERNAL errors (e.g. after another
        # process was killed mid-work). Re-exec once in a FRESH process
        # (a fresh PJRT client) after a drain pause; the driver records
        # whatever the retry prints.
        if os.environ.get("BENCH_RETRIED") == "1":
            raise
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              "re-exec retry in 30s", file=sys.stderr)
        time.sleep(30)
        os.environ["BENCH_RETRIED"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
