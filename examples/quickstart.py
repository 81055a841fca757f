#!/usr/bin/env python
"""Executable tour of the framework — the reference's whole workflow plus
what it couldn't do, end to end in one script.

    python examples/quickstart.py [--config vit_tiny_16_224] [--images 4]

Steps: synthesize a reference-format workspace (weights + packed inputs),
produce golden answers with the fp32 oracle, run the TPU engine (bf16 +
fused Pallas attention), pass the reference's comparator gate, report
accuracy, then do it again with int8 weights.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="vit_tiny_16_224")
    parser.add_argument("--images", type=int, default=4)
    args = parser.parse_args()

    from vit_with_opencl_tpu import get_config
    from vit_with_opencl_tpu.engine import InferenceEngine
    from vit_with_opencl_tpu.harness import fixtures, results
    from vit_with_opencl_tpu.io import binfmt
    from vit_with_opencl_tpu.models import golden

    cfg = get_config(args.config)
    ws = tempfile.mkdtemp(prefix="vit_tpu_quickstart_")
    print(f"== workspace: {ws} (config {cfg.name}, {args.images} images)")

    # 1. Reference-format fixtures: Weight_<idx>_<name>.bin + packed input.
    params = fixtures.random_params(cfg, seed=0, scale=0.02)
    images = fixtures.random_images(cfg, n=args.images, seed=1)
    binfmt.save_weights(os.path.join(ws, "Network"),
                        fixtures.params_to_positional(params, cfg), cfg)
    binfmt.save_image_data(os.path.join(ws, "input.bin"), images)
    print(f"== wrote {len(binfmt.weight_names(cfg))} weight files + input.bin")

    # 2. Golden answers (fp32 oracle, ViT_seq.c semantics — weights as the
    #    loader sees them, i.e. rounded to 6 decimals).
    rounded = {k: binfmt.round_6dp(v) for k, v in params.items()}
    probs_golden = golden.golden_forward(images, rounded, cfg)
    answer = os.path.join(ws, "answer_result.txt")
    results.write_results(answer, probs_golden)
    print(f"== golden answers: {open(answer).readline().strip()} ...")

    # 3. Load through the (native, if built) io layer and run the TPU engine.
    weights = binfmt.weights_to_dict(
        binfmt.load_weights(os.path.join(ws, "Network"), cfg, strict=True), cfg
    )
    engine = InferenceEngine(cfg, weights, batch_size=args.images,
                             attention_impl="flash")
    compile_s = engine.warmup()
    t0 = time.perf_counter()
    probs = engine.run(binfmt.load_image_data(os.path.join(ws, "input.bin")))
    dt = time.perf_counter() - t0
    print(f"== TPU engine: compile {compile_s:.1f}s, run {dt:.3f}s "
          f"({args.images / dt:.1f} img/s at this tiny batch)")

    # 4. The reference's verification contract.
    result = os.path.join(ws, "result.txt")
    results.write_results(result, probs)
    errors = results.compare_result_files(result, answer)
    print(f"== comparator (label exact + prob ±0.01): "
          f"{'PASS' if errors == 0 else f'{errors} mismatches'}")

    # 5. Accuracy against (golden-derived) labels.
    labels = [int(p.argmax()) for p in probs_golden]
    acc = results.evaluate_accuracy(probs, labels)
    print(f"== accuracy vs golden labels: top-1 {acc['top1']*100:.0f}%")

    # 6. int8 weight-only quantization — half the weight memory, same gate.
    engine_q = InferenceEngine(cfg, weights, batch_size=args.images,
                               attention_impl="flash", quantize="int8")
    probs_q = engine_q.run(images)
    results.write_results(os.path.join(ws, "result_int8.txt"), probs_q)
    errors_q = results.compare_result_files(
        os.path.join(ws, "result_int8.txt"), answer)
    print(f"== int8 comparator: {'PASS' if errors_q == 0 else 'FAIL'} "
          f"(max |Δprob| vs bf16: {np.abs(probs_q - probs).max():.2e})")

    # 7. W8A8 dynamic quantization — int8 activations too, on the MXU's
    # double-rate int path (+37-45% over bf16 on TPU; same comparator gate).
    engine_w8 = InferenceEngine(cfg, weights, batch_size=args.images,
                                attention_impl="flash",
                                quantize="int8-w8a8")
    probs_w8 = engine_w8.run(images)
    results.write_results(os.path.join(ws, "result_w8a8.txt"), probs_w8)
    errors_w8 = results.compare_result_files(
        os.path.join(ws, "result_w8a8.txt"), answer)
    print(f"== W8A8 comparator: {'PASS' if errors_w8 == 0 else 'FAIL'} "
          f"(max |Δprob| vs bf16: {np.abs(probs_w8 - probs).max():.2e})")
    return 0 if errors == 0 and errors_q == 0 and errors_w8 == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
