"""TPU model vs golden oracle: fp32 tight parity, bf16 within the 1e-3 gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig, CLIP_VIT_B_16, DEIT_B_16_224
from vit_with_opencl_tpu.engine import InferenceEngine
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import golden, vit

SMALL = ViTConfig(
    name="small",
    img_size=32,
    patch_size=8,
    embed_dim=64,
    depth=3,
    num_heads=4,
    num_classes=13,
)


@pytest.fixture(scope="module")
def small_setup():
    params = fixtures.random_params(SMALL, seed=7, scale=0.05)
    images = fixtures.random_images(SMALL, n=3, seed=3)
    ref = golden.golden_forward(images, params, SMALL)
    return params, images, ref


def test_fp32_matches_golden_tight(small_setup):
    params, images, ref = small_setup
    stacked = vit.stack_params(params, SMALL, param_dtype=jnp.float32)
    probs = vit.forward(
        jnp.asarray(images), stacked, SMALL, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_bf16_within_parity_gate(small_setup):
    params, images, ref = small_setup
    stacked = vit.stack_params(params, SMALL, param_dtype=jnp.bfloat16)
    probs = vit.forward(
        jnp.asarray(images), stacked, SMALL, compute_dtype=jnp.bfloat16
    )
    # BASELINE target: max abs err < 1e-3 on probabilities.
    assert np.max(np.abs(np.asarray(probs) - ref)) < 1e-3


def test_logits_and_probs_consistent(small_setup):
    params, images, _ = small_setup
    stacked = vit.stack_params(params, SMALL, param_dtype=jnp.float32)
    logits = vit.forward(
        jnp.asarray(images), stacked, SMALL, compute_dtype=jnp.float32,
        return_logits=True,
    )
    probs = vit.forward(
        jnp.asarray(images), stacked, SMALL, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits, axis=-1)), np.asarray(probs), atol=1e-6
    )


def test_patchify_matches_golden():
    imgs = fixtures.random_images(SMALL, n=2, seed=1)
    params = fixtures.random_params(SMALL, seed=0)
    ours = vit.patchify(jnp.asarray(imgs), SMALL)
    for i in range(2):
        ref = golden.patch_embed(
            imgs[i], params["conv_proj_weight"], params["conv_proj_bias"], SMALL
        )
        w = params["conv_proj_weight"].reshape(SMALL.embed_dim, -1)
        ours_embed = np.asarray(ours[i]) @ w.T + params["conv_proj_bias"]
        np.testing.assert_allclose(ours_embed, ref, atol=1e-4)


def test_engine_end_to_end_with_padding(small_setup):
    params, images, ref = small_setup
    # batch_size larger than n forces the padding path.
    engine = InferenceEngine(
        SMALL, params, batch_size=8, param_dtype=jnp.float32,
        compute_dtype=jnp.float32,
    )
    compile_s = engine.warmup()
    assert compile_s > 0
    probs = engine.run(images)
    assert probs.shape == ref.shape
    np.testing.assert_allclose(probs, ref, atol=1e-5)
    # multi-batch path
    probs2 = engine.run(np.tile(images, (3, 1, 1, 1)))
    np.testing.assert_allclose(probs2[:3], ref, atol=1e-5)


def test_deit_dual_head():
    cfg = ViTConfig(
        name="deit_small", img_size=32, patch_size=8, embed_dim=64, depth=2,
        num_heads=4, num_classes=7, num_prefix_tokens=2, head_type="cls+dist",
    )
    params = fixtures.random_params(cfg, seed=5, scale=0.05)
    images = fixtures.random_images(cfg, n=2, seed=2)
    ref = golden.golden_forward(images, params, cfg)
    stacked = vit.stack_params(params, cfg, param_dtype=jnp.float32)
    probs = vit.forward(jnp.asarray(images), stacked, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_clip_tower_features():
    cfg = ViTConfig(
        name="clip_small", img_size=32, patch_size=8, embed_dim=64, depth=2,
        num_heads=4, head_type="none", pre_norm=True,
    )
    params = fixtures.random_params(cfg, seed=6, scale=0.05)
    images = fixtures.random_images(cfg, n=2, seed=4)
    ref = golden.golden_features(images, params, cfg)
    stacked = vit.stack_params(params, cfg, param_dtype=jnp.float32)
    feats = vit.forward_features(
        jnp.asarray(images), stacked, cfg, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(feats[:, 0]), ref, atol=1e-5)
    with pytest.raises(ValueError):
        vit.forward(jnp.asarray(images), stacked, cfg)


def test_long_sequence_config_runs():
    """A @384-style config (577 tokens) — beyond the reference's seq<=256
    attention cap (multihead.cl:81-83); must run out of the box here."""
    cfg = ViTConfig(
        name="long", img_size=96, patch_size=4, embed_dim=32, depth=1,
        num_heads=2, num_classes=5,
    )
    assert cfg.num_tokens == 577
    params = fixtures.random_params(cfg, seed=8, scale=0.05)
    images = fixtures.random_images(cfg, n=1, seed=8)
    ref = golden.golden_forward(images, params, cfg)
    stacked = vit.stack_params(params, cfg, param_dtype=jnp.float32)
    probs = vit.forward(jnp.asarray(images), stacked, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)
