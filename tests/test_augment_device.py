"""Device-side augmentation (augment_device) vs its host twins.

Strategy: the random DRAWS differ by construction (jax.random vs NumPy
Generators), so parity is pinned at the op level — every RandAugment op
and the resampling kernels are pure functions of (image, argument), and
the device op must match the host op exactly (both quantize through uint8)
on fixed arguments. The sampling layers get structural/distribution tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import augment, augment_device
from vit_with_opencl_tpu.io.preprocess import (IMAGENET_MEAN, IMAGENET_STD,
                                               _resize_bilinear_np)


@pytest.fixture(scope="module")
def img_u8():
    rng = np.random.default_rng(7)
    # Structured content (gradients + noise) so histogram/contrast ops see
    # realistic statistics, plus saturated patches for autocontrast edges.
    base = np.linspace(0, 255, 32, dtype=np.float32)
    img = (base[:, None, None] + base[None, :, None] / 2
           + rng.normal(0, 30, (32, 32, 3))).clip(0, 255)
    img[:4, :4] = 255.0
    img[-4:, -4:] = 0.0
    return np.round(img).astype(np.uint8)


# Host table name -> (device fn, sample args). Arguments chosen inside each
# op's production range (RAND_AUGMENT_OPS magnitude maps).
_OP_CASES = [
    ("identity", augment_device._identity, 0.0),
    ("autocontrast", augment_device._autocontrast, 0.0),
    ("equalize", augment_device._equalize, 0.0),
    ("posterize", augment_device._posterize, 5.2),
    ("solarize", augment_device._solarize, 128.0),
    ("brightness", augment_device._brightness, 1.45),
    ("brightness", augment_device._brightness, 0.55),
    ("contrast", augment_device._contrast, 1.9),
    ("color", augment_device._color, 0.1),
    ("sharpness", augment_device._sharpness, 1.63),
]


@pytest.mark.parametrize("name,dev_fn,arg", _OP_CASES)
def test_photometric_op_twins(img_u8, name, dev_fn, arg):
    host_fn = augment.RAND_AUGMENT_OPS[name][0]
    want = host_fn(img_u8, arg).astype(np.float32)
    got = np.asarray(dev_fn(jnp.asarray(img_u8, jnp.float32), arg))
    # Exact: both sides round through uint8 after identical float math.
    np.testing.assert_allclose(got, want, atol=1.0 + 1e-6)
    assert np.mean(got != want) < 0.02  # <2% of pixels off by the 1 lsb


@pytest.mark.parametrize("name,arg", [
    ("shear_x", 0.22), ("shear_y", -0.15),
    ("translate_x", 0.3), ("translate_y", -0.12),
    ("translate_x", -0.45), ("translate_y", 0.45),  # full production reach
])
def test_affine_op_twins(img_u8, name, arg):
    """Device single-axis basis warps vs the host _affine NumPy path
    (float input forces the host off PIL onto the documented NumPy
    convention). Shears/translations are unit-diagonal maps, so the
    separable warp is EXACTLY the 2-D bilinear warp."""
    host_fn = augment.RAND_AUGMENT_OPS[name][0]
    want = host_fn(img_u8.astype(np.float32), arg).astype(np.float32)
    dev_fn = getattr(augment_device, f"_{name}")
    got = np.asarray(dev_fn(jnp.asarray(img_u8, jnp.float32), arg))
    np.testing.assert_allclose(got, want, atol=1.0 + 1e-6)
    assert np.mean(got != want) < 0.02


def _host_rotate_paeth(img_f32, deg):
    """Host-side twin of the device Paeth rotation: the same three
    unit-diagonal shears through augment._affine (each u8-rounded)."""
    import math
    r = math.radians(deg)
    a, b = -math.tan(r / 2.0), math.sin(r)
    out = augment._affine(img_f32, (1.0, a, 0.0, 0.0, 1.0, 0.0))
    out = augment._affine(out.astype(np.float32),
                          (1.0, 0.0, 0.0, b, 1.0, 0.0))
    return augment._affine(out.astype(np.float32),
                           (1.0, a, 0.0, 0.0, 1.0, 0.0))


@pytest.mark.parametrize("deg", [17.0, -30.0])
def test_rotate_paeth_twin(img_u8, deg):
    """Device rotate == composing the three host _affine shears exactly
    (the Paeth factorization Sx(α)·Sy(β)·Sx(α) = R(θ))."""
    want = _host_rotate_paeth(img_u8.astype(np.float32), deg)
    got = np.asarray(augment_device._rotate(
        jnp.asarray(img_u8, jnp.float32), deg))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               atol=1.0 + 1e-6)
    assert np.mean(got != want) < 0.02


def test_rotate_geometry_matches_direct_resample(img_u8):
    """The 3-shear rotation and the single-resample host _rotate differ
    only by interpolation scheme — interior pixels must agree closely on
    smooth content (catches any sign/direction/center error)."""
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    smooth = np.stack([y * 8, x * 8, (y + x) * 4], axis=-1)
    want = augment.RAND_AUGMENT_OPS["rotate"][0](smooth, 21.0)
    got = np.asarray(augment_device._rotate(jnp.asarray(smooth), 21.0))
    inner = (slice(8, 24), slice(8, 24))
    err = np.abs(got[inner] - want.astype(np.float32)[inner]).mean()
    assert err < 3.0, err


@pytest.mark.parametrize("g,m,sign", [
    (0, 9.0, False), (1, 7.0, True), (2, 9.5, False), (3, 6.0, True),
    (4, 10.0, True), (4, 9.0, False),
])
def test_geom_apply_matches_standalone_ops(img_u8, g, m, sign):
    """The fused parameter-selected warp (production RandAugment path)
    reproduces each standalone geometric device op bit-for-bit."""
    name, op, lvl, _signed = augment_device.DEVICE_RAND_AUGMENT_OPS[
        augment_device._GEOM_BASE + g]
    v = lvl(m)
    v = -v if sign else v
    img = jnp.asarray(img_u8, jnp.float32)
    want = np.asarray(op(img, v))
    got = np.asarray(augment_device._geom_apply(
        img, jnp.int32(augment_device._GEOM_BASE + g),
        jnp.float32(m), jnp.asarray(sign)))
    np.testing.assert_array_equal(got, want)


def test_geom_apply_pointwise_index_is_identity(img_u8):
    """Out-of-range (pointwise) op indices make the warp an exact
    identity — the select in _rand_augment_one relies on it being safe to
    compute unconditionally."""
    img = jnp.asarray(img_u8, jnp.float32)
    got = np.asarray(augment_device._geom_apply(
        img, jnp.int32(3), jnp.float32(9.0), jnp.asarray(True)))
    np.testing.assert_array_equal(got, np.asarray(img))


def test_posterize_identity_at_8_bits(img_u8):
    got = np.asarray(augment_device._posterize(
        jnp.asarray(img_u8, jnp.float32), 8.0))
    np.testing.assert_array_equal(got, img_u8.astype(np.float32))


def test_crop_resize_matches_numpy_bilinear(img_u8):
    """Static crop box: device gather-resize == host slice + bilinear."""
    top, left, ch, cw = 3, 5, 21, 17
    want = _resize_bilinear_np(
        img_u8[top:top + ch, left:left + cw].astype(np.float32), 16, 16)
    got = np.asarray(augment_device._crop_resize(
        jnp.asarray(img_u8), jnp.int32(top), jnp.int32(left),
        jnp.int32(ch), jnp.int32(cw), 16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_rrc_box_bounds_and_coverage():
    """Sampled boxes stay inside the image and follow the scale range."""
    h = w = 64
    areas, tops = [], []
    for i in range(64):
        top, left, ch, cw = jax.jit(
            lambda k: augment_device._rrc_box(
                k, h, w, (0.08, 1.0), (3 / 4, 4 / 3))
        )(jax.random.key(i))
        top, left, ch, cw = map(int, (top, left, ch, cw))
        assert 0 < ch <= h and 0 < cw <= w
        assert 0 <= top <= h - ch and 0 <= left <= w - cw
        assert 0.6 <= (cw / ch) <= 1.7  # ratio bounds (pre-rounding slack)
        areas.append(ch * cw / (h * w))
        tops.append(top)
    # Area spans the scale range rather than collapsing to a point.
    assert min(areas) < 0.3 and max(areas) > 0.6
    assert len(set(tops)) > 8


def test_device_augment_end_to_end_shapes_and_stats():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)
    out = augment_device.device_augment(
        jnp.asarray(imgs), jax.random.key(1), img_size=32)
    assert out.shape == (8, 3, 32, 32) and out.dtype == jnp.float32
    arr = np.asarray(out)
    assert np.isfinite(arr).all()
    assert abs(arr).max() < 8.0  # normalized few-sigma band, not [0,255]
    # Per-image keys: images in the batch get DIFFERENT augmentations.
    assert not np.allclose(arr[0], arr[1])
    # Deterministic in the key.
    out2 = augment_device.device_augment(
        jnp.asarray(imgs), jax.random.key(1), img_size=32)
    np.testing.assert_array_equal(arr, np.asarray(out2))


def test_device_augment_no_randaugment_is_pure_geometry():
    """randaugment=None keeps the float crop un-quantized (host `one()`
    behavior) — values need not sit on the u8 grid after normalize."""
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (4, 48, 48, 3), dtype=np.uint8)
    out = augment_device.device_augment(
        jnp.asarray(imgs), jax.random.key(0), img_size=32,
        randaugment=None, hflip=0.0)
    assert out.shape == (4, 3, 32, 32)
    # Un-normalize and check values live in [0, 255] interior.
    arr = (np.asarray(out).transpose(0, 2, 3, 1)
           * (np.asarray(IMAGENET_STD) * 255.0)
           + np.asarray(IMAGENET_MEAN) * 255.0)
    assert arr.min() > -1e-3 and arr.max() < 255.0 + 1e-3


def test_device_augment_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8 HWC"):
        augment_device.device_augment(
            jnp.zeros((2, 8, 8, 3), jnp.float32), jax.random.key(0),
            img_size=8)


def test_raw_batches_loader():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (10, 16, 16, 3), dtype=np.uint8)
    labels = np.arange(10)
    got = list(augment_device.raw_batches(imgs, labels, 4, epochs=2,
                                          seed=5))
    assert len(got) == 4  # 10//4 = 2 batches x 2 epochs
    for x, y in got:
        assert x.dtype == np.uint8 and x.shape == (4, 16, 16, 3)
        assert y.shape == (4,)
        # Batch content is the source rows for its labels (pure gather).
        np.testing.assert_array_equal(x, imgs[y])
    with pytest.raises(ValueError, match="uint8"):
        next(augment_device.raw_batches(
            imgs.astype(np.float32), labels, 4))
