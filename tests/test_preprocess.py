"""Preprocessing: torchvision-equivalent resize/crop/normalize."""

import numpy as np
import pytest
import torch

from vit_with_opencl_tpu.io import binfmt, preprocess


def _random_image(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def test_matches_torchvision_semantics():
    """Compare against torch's functional ops on a smooth image (PIL bilinear
    and torch interpolate differ per-pixel on noise, but must agree on smooth
    content — which is what catches crop/alignment/normalization bugs)."""
    yy, xx = np.mgrid[0:300, 0:400]
    img = np.stack(
        [(yy * 255 / 300), (xx * 255 / 400), ((yy + xx) * 255 / 700)], axis=-1
    ).astype(np.uint8)
    ours = preprocess.preprocess_array(img)
    assert ours.shape == (3, 224, 224)

    t = torch.from_numpy(img.transpose(2, 0, 1)).float()[None]
    resized = torch.nn.functional.interpolate(
        t, size=(256, 341), mode="bilinear", align_corners=False,
        antialias=False,
    )[0]
    top = (256 - 224) // 2
    left = (341 - 224) // 2
    crop = resized[:, top : top + 224, left : left + 224] / 255.0
    mean = torch.tensor(preprocess.IMAGENET_MEAN).view(3, 1, 1)
    std = torch.tensor(preprocess.IMAGENET_STD).view(3, 1, 1)
    theirs = ((crop - mean) / std).numpy()
    # PIL vs torch interpolate differ slightly at pixel level; the normalized
    # output should still agree closely on average.
    assert np.abs(ours - theirs).mean() < 0.05


def test_numpy_fallback_close_to_pil():
    img = _random_image(260, 320, seed=3)
    a = preprocess.preprocess_array(img)
    resized_np = preprocess._resize_bilinear_np(img, 256, 315)
    assert resized_np.shape == (256, 315, 3)
    assert np.isfinite(resized_np).all()
    assert a.dtype == np.float32


def test_grayscale_and_rgba_handling():
    gray = np.random.default_rng(0).integers(0, 256, (240, 240), np.uint8)
    out = preprocess.preprocess_array(gray)
    assert out.shape == (3, 224, 224)
    rgba = np.random.default_rng(1).integers(0, 256, (240, 240, 4), np.uint8)
    out = preprocess.preprocess_array(rgba)
    assert out.shape == (3, 224, 224)


def test_files_to_input_bin_roundtrip(tmp_path):
    from PIL import Image

    paths = []
    for i in range(2):
        img = _random_image(250, 270, seed=i)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    out_bin = tmp_path / "input.bin"
    batch = preprocess.images_to_input_bin(paths, out_bin)
    assert batch.shape == (2, 3, 224, 224)
    loaded = binfmt.load_image_data(out_bin)
    np.testing.assert_array_equal(loaded, batch)
    # Normalized values in a plausible range (like the shipped input-1.bin).
    assert np.abs(loaded).max() < 10.0


def test_384_config_shapes():
    img = _random_image(500, 400, seed=7)
    out = preprocess.preprocess_array(img, img_size=384, resize_size=438)
    assert out.shape == (3, 384, 384)
