"""End-to-end slice: fixtures on disk → CLI → comparator green.

This is the reference's only real test — golden-file integration parity
(SURVEY.md §4) — made hermetic with synthetic weights.
"""

import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig, cli
from vit_with_opencl_tpu.harness import fixtures, results
from vit_with_opencl_tpu.io import binfmt
from vit_with_opencl_tpu.models import golden

CFG = ViTConfig(
    name="e2e_small",
    img_size=32,
    patch_size=8,
    embed_dim=48,
    depth=2,
    num_heads=4,
    num_classes=1000,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """A fake reference workspace: input binary + weight dir + answer file."""
    root = tmp_path_factory.mktemp("ws")
    params = fixtures.random_params(CFG, seed=11, scale=0.05)
    images = fixtures.random_images(CFG, n=4, seed=5)
    binfmt.save_image_data(root / "input.bin", images)
    binfmt.save_weights(root / "Network", fixtures.params_to_positional(params, CFG), CFG)

    # Golden answers from weights as the loader will see them (6dp-rounded).
    rounded = {k: binfmt.round_6dp(v) for k, v in params.items()}
    probs = golden.golden_forward(images, rounded, CFG)
    results.write_results(root / "answer.txt", probs)
    return root


def _patched_presets(monkeypatch):
    from vit_with_opencl_tpu import config as config_lib

    monkeypatch.setitem(config_lib.PRESETS, "e2e_small", CFG)


def test_cli_golden_backend_matches_answer(workspace, monkeypatch):
    _patched_presets(monkeypatch)
    rc = cli.main(
        [
            "--input", str(workspace / "input.bin"),
            "--weights", str(workspace / "Network"),
            "--output", str(workspace / "result.txt"),
            "--answer", str(workspace / "answer.txt"),
            "--backend", "golden",
            "--config", "e2e_small",
        ]
    )
    assert rc == 0
    assert results.compare_result_files(
        workspace / "result.txt", workspace / "answer.txt"
    ) == 0


def test_cli_tpu_backend_calibrated_w8a8(workspace, monkeypatch):
    """--calibrate wires outlier-aware W8A8 through the CLI (VERDICT r4 #1):
    quantize defaults to w8a8, the calibration binary feeds
    quant.calibrate_w8a8, and the result stays inside the comparator gate."""
    _patched_presets(monkeypatch)
    binfmt.save_image_data(
        workspace / "calib.bin", fixtures.random_images(CFG, n=4, seed=21))
    rc = cli.main(
        [
            "--input", str(workspace / "input.bin"),
            "--weights", str(workspace / "Network"),
            "--output", str(workspace / "result_cal.txt"),
            "--answer", str(workspace / "answer.txt"),
            "--backend", "tpu",
            "--config", "e2e_small",
            "--calibrate", str(workspace / "calib.bin"),
            "--batch-size", "4",
        ]
    )
    assert rc == 0  # comparator green (0.01 gate) under calibrated W8A8


def test_weight_rounding_affects_results(workspace, monkeypatch):
    """The 6-decimal rounding is part of observed behavior; loading without it
    must produce (slightly) different probabilities."""
    weights_r = binfmt.load_weights(workspace / "Network", CFG, strict=True)
    weights_raw = binfmt.load_weights(
        workspace / "Network", CFG, round_to_6dp=False, strict=True
    )
    images = binfmt.load_image_data(workspace / "input.bin")
    p_r = golden.golden_forward(images, binfmt.weights_to_dict(weights_r, CFG), CFG)
    p_raw = golden.golden_forward(images, binfmt.weights_to_dict(weights_raw, CFG), CFG)
    assert not np.array_equal(p_r, p_raw)
    # ...but only at fine precision; the comparator gate would still pass.
    np.testing.assert_allclose(p_r, p_raw, atol=1e-3)
