"""End-to-end inference driver — the reference's ``main()`` as a real CLI.

Pipeline (reference: Main.c:16-92): load packed input binary → load weight
directory → run a backend over all images → per-image argmax → write
``[i] label: L / prob: P`` result lines → compare against the golden answer
file. Backend selection is a flag instead of a comment toggle
(Main.c:53-54): ``golden`` is the fp32 oracle (ViT_seq semantics), ``tpu`` is
the jit-compiled engine.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from . import config as config_lib
from .harness import results
from .io import binfmt
from .io.labels import IMAGENET_LABELS


def _run_backend(backend: str, images: np.ndarray, params, cfg,
                 batch_size: int, attention: str = "xla",
                 quantize=None, calibrate=None) -> np.ndarray:
    if backend == "golden":
        from .models import golden

        return golden.golden_forward(images, params, cfg)
    elif backend == "tpu":
        from .engine import InferenceEngine, enable_compilation_cache

        enable_compilation_cache()
        engine = InferenceEngine(
            cfg, params, batch_size=batch_size, attention_impl=attention,
            quantize=quantize, calibrate=calibrate,
        )
        return engine.run(images)
    else:
        raise ValueError(f"unknown backend {backend!r}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", default="./Data/input-100.bin",
                        help="packed image binary (header + NCHW fp32)")
    parser.add_argument("--raw-images", nargs="+", default=None,
                        help="raw image files (jpg/png/...): preprocess with "
                        "torchvision semantics instead of reading --input")
    parser.add_argument("--weights", default="./Network",
                        help="directory of Weight_<idx>_<name>.bin files")
    parser.add_argument("--output", default="./Data/opencl_result.txt",
                        help="result file to write")
    parser.add_argument("--answer", default=None,
                        help="golden answer file to compare against (optional)")
    parser.add_argument("--label-file", default=None,
                        help="ground-truth labels (one class id per line): "
                        "report top-1/top-5 accuracy")
    parser.add_argument("--backend", choices=["golden", "tpu"], default="tpu")
    parser.add_argument("--config", default="vit_b_16_224",
                        choices=sorted(config_lib.PRESETS))
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--attention", choices=["xla", "flash", "fused_block"], default="xla",
                        help="attention core: XLA einsum chain or the fused "
                        "Pallas flash kernel")
    parser.add_argument("--quantize",
                        choices=["int8", "int8-w8a8", "auto"],
                        default=None,
                        help="int8 quantization for the tpu backend: weight-"
                        "only (bf16 MXU) or w8a8 (dynamic int8 activations "
                        "on the double-rate int8 MXU path)")
    parser.add_argument("--calibrate", default=None, metavar="IMAGES.BIN",
                        help="calibration images (packed input binary) for "
                        "outlier-aware W8A8: calibrates per-channel "
                        "activation statistics and keeps the hot channels "
                        "in bf16 (exact) — the accuracy-defensible "
                        "quantized mode for trained checkpoints (plain "
                        "per-token W8A8 can break the 0.01 comparator gate "
                        "on outlier-heavy weights). Implies w8a8 when "
                        "--quantize is auto/unset")
    parser.add_argument("--no-round-weights", action="store_true",
                        help="skip the reference's 6-decimal weight rounding")
    parser.add_argument("--print-labels", action="store_true",
                        help="also print human-readable class names")
    parser.add_argument("--pure-python", action="store_true",
                        help="force the NumPy io layer instead of libvitio")
    parser.add_argument("--platform", default=None, metavar="NAME",
                        help="pin the JAX platform (e.g. cpu, tpu) for "
                        "--backend tpu. Use "
                        "--platform cpu to exercise the engine off-chip: "
                        "JAX_PLATFORMS=cpu alone does not stick on hosts "
                        "whose sitecustomize re-registers an accelerator "
                        "plugin (the tunneled-relay boxes)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    cfg = config_lib.get_config(args.config)

    nio = None
    if not args.pure_python:
        from .runtime import get_native_io

        nio = get_native_io()

    t0 = time.perf_counter()
    if args.raw_images:
        from .io import preprocess

        images = preprocess.preprocess_files(
            args.raw_images, img_size=cfg.img_size,
            resize_size=round(cfg.img_size * 256 / 224),
        )
    elif nio is not None:
        images = nio.load_images(args.input)
    else:
        images = binfmt.load_image_data(args.input)
    if nio is not None:
        weights = nio.load_weights(
            args.weights,
            len(binfmt.weight_names(cfg)),
            round_to_6dp=not args.no_round_weights,
            strict=True,
        )
    else:
        weights = binfmt.load_weights(
            args.weights, cfg, round_to_6dp=not args.no_round_weights, strict=True
        )
    params = binfmt.weights_to_dict(weights, cfg)
    t_load = time.perf_counter() - t0
    print(f"loaded {images.shape[0]} images + {len(weights)} weights "
          f"in {t_load:.2f}s ({'libvitio' if nio else 'numpy'} io)")

    calibrate = None
    if args.calibrate:
        if args.backend != "tpu":
            raise SystemExit("--calibrate only applies to the tpu backend")
        if args.quantize in (None, "auto"):
            args.quantize = "int8-w8a8"
        calibrate = (nio.load_images(args.calibrate) if nio is not None
                     else binfmt.load_image_data(args.calibrate))
        print(f"calibration set: {calibrate.shape[0]} images "
              f"({args.calibrate})")

    print("=====================Start========================")
    t0 = time.perf_counter()
    probs = _run_backend(args.backend, images, params, cfg, args.batch_size,
                         args.attention, args.quantize, calibrate)
    elapsed = time.perf_counter() - t0
    n = images.shape[0]
    print(f"Elapsed time: {elapsed:.4f} sec ({n / elapsed:.2f} images/sec)")

    preds = results.write_results(args.output, probs)
    if args.print_labels:
        for i, (label, prob) in enumerate(preds):
            print(f"[{i}] {IMAGENET_LABELS[label]} ({label}): {prob:.6f}")

    if args.label_file:
        acc = results.evaluate_accuracy(
            probs, results.load_label_file(args.label_file)
        )
        print(f"accuracy: top-1 {acc['top1']*100:.2f}%  "
              f"top-5 {acc['top5']*100:.2f}%  (n={acc['n']})")

    if args.answer:
        errors = results.compare_result_files(args.output, args.answer)
        if errors == 0:
            print("Comparator: files match.")
        else:
            print(f"Comparator: {errors} mismatches.")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
