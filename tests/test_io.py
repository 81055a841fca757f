"""Formats layer: image binaries, weight binaries, index map, rounding."""

import os

import jax
import numpy as np
import pytest

from vit_with_opencl_tpu import VIT_B_16_224, DEIT_B_16_224, CLIP_VIT_B_16
from vit_with_opencl_tpu.io import binfmt
from vit_with_opencl_tpu.harness import fixtures


def test_image_roundtrip(tmp_path):
    imgs = np.random.default_rng(0).standard_normal((3, 3, 8, 8)).astype(np.float32)
    path = tmp_path / "input.bin"
    binfmt.save_image_data(path, imgs)
    # header 4*i4 + payload
    assert os.path.getsize(path) == 16 + imgs.size * 4
    loaded = binfmt.load_image_data(path)
    np.testing.assert_array_equal(loaded, imgs)


def test_load_reference_input(reference_root):
    """The shipped 1-image fixture: header (1,3,224,224), 602,128 bytes."""
    path = os.path.join(reference_root, "Data", "input-1.bin")
    imgs = binfmt.load_image_data(path)
    assert imgs.shape == (1, 3, 224, 224)
    assert imgs.dtype == np.float32
    # Normalized tensor values, not raw bytes.
    assert np.abs(imgs).max() < 10.0


def test_weight_names_reference_layout():
    names = binfmt.weight_names(VIT_B_16_224)
    assert len(names) == 152
    assert names[0] == "class_token"
    assert names[1] == "conv_proj_weight"
    assert names[2] == "conv_proj_bias"
    assert names[3] == "encoder_pos_embedding"
    assert names[4] == "encoder_layers_encoder_layer_0_ln_1_weight"
    assert names[77] == "encoder_layers_encoder_layer_6_ln_1_bias"
    assert names[148] == "encoder_ln_weight"
    assert names[151] == "heads_head_bias"


def test_weight_shapes_reference_sizes():
    shapes = binfmt.weight_shapes(VIT_B_16_224)
    assert shapes["class_token"] == (768,)
    assert shapes["conv_proj_weight"] == (768, 3, 16, 16)
    assert shapes["encoder_pos_embedding"] == (197, 768)
    assert shapes["encoder_layers_encoder_layer_0_self_attention_in_proj_weight"] == (
        2304,
        768,
    )
    assert shapes["heads_head_weight"] == (1000, 768)


def test_parse_index():
    assert binfmt.parse_index_from_filename(
        "Weight_96_encoder_layers_encoder_layer_7_mlp_0_weight.bin"
    ) == (96, "encoder_layers_encoder_layer_7_mlp_0_weight")
    assert binfmt.parse_index_from_filename("notaweight.bin") is None
    assert binfmt.parse_index_from_filename("Weight_x_foo.bin") is None


def test_round_6dp_matches_c_roundf():
    # roundf rounds half away from zero; exercise halfway cases and signs.
    x = np.array([0.1234565, -0.1234565, 1.0000005, -1.0000005, 0.0], np.float32)
    r = binfmt.round_6dp(x)
    # Halfway behavior on the *fp32 product* (x*1e6f), not the decimal literal:
    # verify against explicit float32 emulation.
    scaled = (x * np.float32(1e6)).astype(np.float64)
    expected = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(
        np.float32
    ) / np.float32(1e6)
    np.testing.assert_array_equal(r, expected)
    assert r.dtype == np.float32


def test_weight_roundtrip(tmp_path):
    cfg = VIT_B_16_224
    params = fixtures.random_params(cfg, seed=0)
    tensors = fixtures.params_to_positional(params, cfg)
    wdir = tmp_path / "Network"
    binfmt.save_weights(wdir, tensors, cfg)
    files = sorted(os.listdir(wdir))
    assert len(files) == 152
    loaded = binfmt.load_weights(wdir, cfg, round_to_6dp=False, strict=True)
    for idx, tensor in enumerate(tensors):
        np.testing.assert_array_equal(
            loaded[idx], np.asarray(tensor, np.float32).ravel()
        )
    # Named + reshaped round trip.
    named = binfmt.weights_to_dict(loaded, cfg)
    for name in params:
        np.testing.assert_array_equal(named[name], params[name])


def test_load_reference_weights_partial(reference_root):
    """116 of 152 files are present in the mount; loader must read them all
    byte-for-byte and leave the stripped indices absent."""
    wdir = os.path.join(reference_root, "Network")
    weights = binfmt.load_weights(wdir, VIT_B_16_224, round_to_6dp=False)
    assert len(weights) == 116
    assert weights[0].size == 768  # class_token
    assert weights[3].size == 197 * 768  # pos embedding
    assert weights[150].size == 1000 * 768  # head weight
    with pytest.raises(FileNotFoundError):
        binfmt.load_weights(wdir, VIT_B_16_224, strict=True)


def test_rounding_applied_on_load(tmp_path):
    cfg = VIT_B_16_224
    arr = np.array([0.12345678, -0.98765432], np.float32)
    path = tmp_path / "Weight_0_class_token.bin"
    arr.tofile(path)
    loaded = binfmt.load_weights(tmp_path, count=152)
    np.testing.assert_array_equal(loaded[0], binfmt.round_6dp(arr))
    raw = binfmt.load_weights(tmp_path, count=152, round_to_6dp=False)
    np.testing.assert_array_equal(raw[0], arr)


def test_variant_weight_maps():
    deit_names = binfmt.weight_names(DEIT_B_16_224)
    assert "dist_token" in deit_names
    assert "heads_head_dist_weight" in deit_names
    clip_names = binfmt.weight_names(CLIP_VIT_B_16)
    assert "encoder_pre_ln_weight" in clip_names
    assert "heads_head_weight" not in clip_names
    shapes = binfmt.weight_shapes(DEIT_B_16_224)
    assert shapes["encoder_pos_embedding"] == (198, 768)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Framework-native checkpoints: stacked pytree round-trips via Orbax."""
    import jax.numpy as jnp

    from vit_with_opencl_tpu.io import checkpoint
    from vit_with_opencl_tpu.models import vit
    from vit_with_opencl_tpu import ViTConfig

    cfg = ViTConfig(name="ck", img_size=32, patch_size=8, embed_dim=48,
                    depth=1, num_heads=4, num_classes=5)
    params = vit.stack_params(fixtures.random_params(cfg, seed=0), cfg,
                              param_dtype=jnp.float32)
    path = tmp_path / "ckpt"
    checkpoint.save_checkpoint(path, params)
    restored = checkpoint.load_checkpoint(path, like=params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_maps_consistent_across_presets():
    """Every preset's name list and shape dict must agree exactly."""
    from vit_with_opencl_tpu import PRESETS

    for name, cfg in PRESETS.items():
        names = binfmt.weight_names(cfg)
        shapes = binfmt.weight_shapes(cfg)
        assert set(names) == set(shapes), name
        assert len(names) == len(set(names)), f"{name}: duplicate names"
        # positional round trip through the filename parser
        for idx, n in enumerate(names):
            parsed = binfmt.parse_index_from_filename(f"Weight_{idx}_{n}.bin")
            assert parsed == (idx, n)


def test_checkpoint_to_forward_roundtrip(tmp_path):
    """Params restored from an Orbax checkpoint produce identical outputs."""
    import jax.numpy as jnp

    from vit_with_opencl_tpu import ViTConfig
    from vit_with_opencl_tpu.io import checkpoint
    from vit_with_opencl_tpu.models import vit

    cfg = ViTConfig(name="ckf", img_size=32, patch_size=8, embed_dim=48,
                    depth=1, num_heads=4, num_classes=5)
    params = vit.stack_params(fixtures.random_params(cfg, seed=2), cfg,
                              param_dtype=jnp.float32)
    images = jnp.asarray(fixtures.random_images(cfg, n=2, seed=2))
    before = np.asarray(vit.forward(images, params, cfg,
                                    compute_dtype=jnp.float32))
    checkpoint.save_checkpoint(tmp_path / "ck", params)
    restored = checkpoint.load_checkpoint(tmp_path / "ck", like=params)
    after = np.asarray(vit.forward(images, restored, cfg,
                                   compute_dtype=jnp.float32))
    np.testing.assert_array_equal(before, after)
