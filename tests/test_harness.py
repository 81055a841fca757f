"""Result-file writer + comparator parity tests."""

import numpy as np
import pytest

from vit_with_opencl_tpu.harness import results


def test_format_line_matches_reference():
    # Reference emits "[%d] label: %d / prob: %.6f" (Main.c:71); the shipped
    # golden file's first line is exactly this.
    assert results.format_result_line(0, 65, 0.919345) == "[0] label: 65 / prob: 0.919345"


def test_parse_line():
    assert results.parse_result_line("[0] label: 65 / prob: 0.919345") == (65, 0.919345)
    assert results.parse_result_line("garbage") is None


def test_argmax_reset_per_image():
    # The reference's latent bug carries pred_idx across images; ours resets.
    probs = np.array(
        [
            [0.1, 0.9, 0.0],
            [0.8, 0.1, 0.1],  # argmax is index 0 — unreachable in the reference
        ],
        np.float32,
    )
    preds = results.argmax_predictions(probs)
    assert preds == [(1, pytest.approx(0.9)), (0, pytest.approx(0.8))]


def test_write_and_compare_pass(tmp_path):
    probs = np.random.default_rng(0).dirichlet(np.ones(10), size=4).astype(np.float32)
    res, ans = tmp_path / "result.txt", tmp_path / "answer.txt"
    results.write_results(res, probs)
    results.write_results(ans, probs)
    assert results.compare_result_files(res, ans) == 0


def test_compare_label_mismatch(tmp_path):
    res, ans = tmp_path / "r.txt", tmp_path / "a.txt"
    res.write_text("[0] label: 5 / prob: 0.900000\n")
    ans.write_text("[0] label: 6 / prob: 0.900000\n")
    assert results.compare_result_files(res, ans, verbose=False) == 1


def test_compare_prob_tolerance(tmp_path):
    res, ans = tmp_path / "r.txt", tmp_path / "a.txt"
    # within 0.01 → pass (comparator.c:81)
    res.write_text("[0] label: 5 / prob: 0.905000\n")
    ans.write_text("[0] label: 5 / prob: 0.900000\n")
    assert results.compare_result_files(res, ans, verbose=False) == 0
    res.write_text("[0] label: 5 / prob: 0.915000\n")
    assert results.compare_result_files(res, ans, verbose=False) == 1


def test_compare_short_file(tmp_path):
    res, ans = tmp_path / "r.txt", tmp_path / "a.txt"
    res.write_text("[0] label: 5 / prob: 0.9\n")
    ans.write_text("[0] label: 5 / prob: 0.9\n[1] label: 6 / prob: 0.8\n")
    assert results.compare_result_files(res, ans, verbose=False) == 1


def test_compare_reference_golden_files(reference_root):
    """The shipped OpenCL results agree with the shipped golden file — our
    comparator must also judge them equal (same gate as comparator.c)."""
    import os

    res = os.path.join(reference_root, "Data", "opencl_result.txt")
    ans = os.path.join(reference_root, "Data", "answer_result.txt")
    assert results.compare_result_files(res, ans) == 0


def test_evaluate_accuracy():
    probs = np.array([
        [0.1, 0.7, 0.2, 0.0],   # pred 1
        [0.5, 0.1, 0.3, 0.1],   # pred 0
        [0.2, 0.3, 0.1, 0.4],   # pred 3
    ], np.float32)
    acc = results.evaluate_accuracy(probs, [1, 2, 3], topk=(1, 2))
    assert acc["top1"] == pytest.approx(2 / 3)
    assert acc["top2"] == pytest.approx(3 / 3)  # label 2 is 2nd for row 1
    with pytest.raises(ValueError, match="labels"):
        results.evaluate_accuracy(probs, [1])


def test_load_label_file(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("5\n7\n\n9\n")
    assert results.load_label_file(p) == [5, 7, 9]


def test_result_line_roundtrip_fuzz():
    """Property: format -> parse is exact for any (label, prob) we can emit."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        label = int(rng.integers(0, 1000))
        prob = float(np.round(rng.random(), 6))
        line = results.format_result_line(int(rng.integers(0, 100)), label, prob)
        parsed = results.parse_result_line(line)
        assert parsed is not None
        assert parsed[0] == label
        assert abs(parsed[1] - prob) < 1e-9
