"""Native C++ IO layer vs the pure-NumPy io layer: byte-for-byte agreement."""

import os

import numpy as np
import pytest

from vit_with_opencl_tpu import VIT_TINY_16_224 as CFG
from vit_with_opencl_tpu.harness import fixtures, results
from vit_with_opencl_tpu.io import binfmt
from vit_with_opencl_tpu.runtime import get_native_io, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def nio():
    return get_native_io()


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    params = fixtures.random_params(CFG, seed=1)
    images = fixtures.random_images(CFG, n=3, seed=1)
    binfmt.save_image_data(root / "input.bin", images)
    binfmt.save_weights(root / "Network", fixtures.params_to_positional(params, CFG), CFG)
    return root, images


def test_load_images_matches_numpy(nio, workspace):
    root, images = workspace
    native = nio.load_images(root / "input.bin")
    ref = binfmt.load_image_data(root / "input.bin")
    np.testing.assert_array_equal(native, ref)
    np.testing.assert_array_equal(native, images)


def test_load_images_error(nio, tmp_path):
    with pytest.raises(IOError, match="cannot open"):
        nio.load_images(tmp_path / "nope.bin")


def test_load_weights_matches_numpy_with_rounding(nio, workspace):
    root, _ = workspace
    count = len(binfmt.weight_names(CFG))
    native = nio.load_weights(root / "Network", count, round_to_6dp=True)
    ref = binfmt.load_weights(root / "Network", CFG, round_to_6dp=True)
    assert set(native) == set(ref)
    for idx in ref:
        np.testing.assert_array_equal(native[idx], ref[idx])


def test_load_weights_raw(nio, workspace):
    root, _ = workspace
    count = len(binfmt.weight_names(CFG))
    native = nio.load_weights(root / "Network", count, round_to_6dp=False)
    ref = binfmt.load_weights(root / "Network", CFG, round_to_6dp=False)
    for idx in ref:
        np.testing.assert_array_equal(native[idx], ref[idx])


def test_load_weights_strict_missing(nio, workspace, tmp_path):
    root, _ = workspace
    import shutil

    part = tmp_path / "Partial"
    shutil.copytree(root / "Network", part)
    victim = sorted(os.listdir(part))[3]
    os.remove(part / victim)
    count = len(binfmt.weight_names(CFG))
    with pytest.raises(FileNotFoundError, match="missing weight indices"):
        nio.load_weights(part, count, strict=True)
    # non-strict: just absent
    loaded = nio.load_weights(part, count, strict=False)
    assert len(loaded) == count - 1


def test_write_results_matches_python(nio, tmp_path):
    probs = np.random.default_rng(0).dirichlet(np.ones(50), size=5).astype(np.float32)
    results.write_results(tmp_path / "py.txt", probs)
    nio.write_results(tmp_path / "cc.txt", probs)
    assert (tmp_path / "py.txt").read_text() == (tmp_path / "cc.txt").read_text()


def test_compare_results_native(nio, tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("[0] label: 5 / prob: 0.900000\n[1] label: 7 / prob: 0.500000\n")
    b.write_text("[0] label: 5 / prob: 0.905000\n[1] label: 7 / prob: 0.500000\n")
    assert nio.compare_results(a, b) == 0
    b.write_text("[0] label: 6 / prob: 0.905000\n[1] label: 7 / prob: 0.600000\n")
    assert nio.compare_results(a, b) == 2  # label + prob mismatches
    # image_count cap mirrors the reference's IMAGE_COUNT (comparator.c:9)
    assert nio.compare_results(a, b, image_count=1) == 1


def test_compare_reference_golden_files_native(nio, reference_root):
    res = os.path.join(reference_root, "Data", "opencl_result.txt")
    ans = os.path.join(reference_root, "Data", "answer_result.txt")
    assert nio.compare_results(res, ans) == 0


def test_malformed_inputs_rejected(nio, tmp_path):
    """Fuzz-derived cases: every malformed file errors cleanly (no crash,
    no silent wrap — incl. header dimensions that overflow size_t)."""
    cases = {
        "empty.bin": b"",
        "short.bin": b"\x01\x00",
        "zero.bin": np.asarray([0, 3, 8, 8], "<i4").tobytes(),
        "neg.bin": np.asarray([-1, 3, 8, 8], "<i4").tobytes(),
        "huge.bin": np.asarray([2**30] * 4, "<i4").tobytes(),
        "trunc.bin": np.asarray([2, 3, 8, 8], "<i4").tobytes() + b"\x00" * 10,
    }
    for name, payload in cases.items():
        p = tmp_path / name
        p.write_bytes(payload)
        with pytest.raises(IOError):
            nio.load_images(p)
    # odd-size weight file (not a multiple of 4 bytes)
    wdir = tmp_path / "W"
    wdir.mkdir()
    (wdir / "Weight_0_class_token.bin").write_bytes(b"\x00" * 7)
    with pytest.raises(IOError, match="bad size"):
        nio.load_weights(wdir, 4)
