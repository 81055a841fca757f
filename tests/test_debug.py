"""NaN-guard / debug helpers."""

import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.debug import checked_forward, find_nan
from vit_with_opencl_tpu.engine import InferenceEngine
from vit_with_opencl_tpu.harness import fixtures

CFG = ViTConfig(name="dbg", img_size=32, patch_size=8, embed_dim=48, depth=1,
                num_heads=4, num_classes=5)


def test_find_nan_clean():
    tree = {"a": jnp.ones((3, 3)), "b": jnp.zeros(4)}
    assert find_nan(tree) == []


def test_find_nan_reports_leaf():
    tree = {"a": jnp.ones(3), "b": jnp.array([1.0, jnp.nan, jnp.inf])}
    hits = find_nan(tree, name="params")
    assert len(hits) == 1
    path, nans, infs = hits[0]
    assert "b" in path and nans == 1 and infs == 1


def test_checked_forward_raises():
    f = checked_forward(lambda x: x / 0.0, what="div")
    with pytest.raises(FloatingPointError, match="non-finite"):
        f(jnp.ones(4))
    ok = checked_forward(lambda x: x * 2, what="mul")
    np.testing.assert_array_equal(np.asarray(ok(jnp.ones(3))), 2.0)


def test_engine_check_numerics_clean_path():
    params = fixtures.random_params(CFG, seed=0, scale=0.05)
    images = fixtures.random_images(CFG, n=2, seed=0)
    engine = InferenceEngine(
        CFG, params, batch_size=2, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, check_numerics=True,
    )
    probs = engine.run(images)
    assert np.isfinite(probs).all()


def test_engine_check_numerics_catches_bad_weights():
    params = fixtures.random_params(CFG, seed=0, scale=0.05)
    params["heads_head_weight"] = params["heads_head_weight"] * np.float32("inf")
    images = fixtures.random_images(CFG, n=2, seed=0)
    engine = InferenceEngine(
        CFG, params, batch_size=2, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, check_numerics=True,
    )
    with pytest.raises(FloatingPointError):
        engine.run(images)


@pytest.mark.parametrize("attention", ["xla", "flash"])
@pytest.mark.parametrize("quantize", [None, "int8"])
@pytest.mark.parametrize("normalize_uint8", [False, True])
def test_engine_feature_matrix(attention, quantize, normalize_uint8):
    """Engine options compose: every combination must run and stay sane."""
    from vit_with_opencl_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD

    params = fixtures.random_params(CFG, seed=1, scale=0.05)
    engine = InferenceEngine(
        CFG, params, batch_size=2, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, attention_impl=attention,
        quantize=quantize, normalize_uint8=normalize_uint8,
        check_numerics=True,
    )
    if normalize_uint8:
        inputs = np.random.default_rng(0).integers(
            0, 256, (3, 3, CFG.img_size, CFG.img_size), np.uint8
        )
    else:
        inputs = fixtures.random_images(CFG, n=3, seed=0)
    probs = engine.run(inputs)
    assert probs.shape == (3, CFG.num_classes)
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-4)


def test_engine_rejects_wrong_input_dtype():
    params = fixtures.random_params(CFG, seed=0, scale=0.05)
    e_f32 = InferenceEngine(CFG, params, batch_size=2,
                            param_dtype=jnp.float32, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="raw uint8"):
        e_f32.run(np.zeros((1, 3, CFG.img_size, CFG.img_size), np.uint8))
    e_u8 = InferenceEngine(CFG, params, batch_size=2, normalize_uint8=True,
                           param_dtype=jnp.float32, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="expects raw"):
        e_u8.run(np.zeros((1, 3, CFG.img_size, CFG.img_size), np.float32))


def test_engine_empty_batch():
    params = fixtures.random_params(CFG, seed=0, scale=0.05)
    e = InferenceEngine(CFG, params, batch_size=2,
                        param_dtype=jnp.float32, compute_dtype=jnp.float32)
    out = e.run(np.zeros((0, 3, CFG.img_size, CFG.img_size), np.float32))
    assert out.shape == (0, CFG.num_classes)
