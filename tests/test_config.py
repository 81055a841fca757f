"""Config validation and derived quantities."""

import pytest

from vit_with_opencl_tpu import ViTConfig, get_config, PRESETS


def test_reference_constants():
    cfg = get_config("vit_b_16_224")
    assert cfg.num_tokens == 197          # 14*14 + CLS (ViT_seq.c:10-21)
    assert cfg.head_dim == 64
    assert cfg.hidden_dim == 3072
    assert cfg.grid_size == 14


def test_flops_matches_published_vit_b():
    # torchvision quotes vit_b_16 at ~17.56 GFLOPs (MAC convention);
    # flops_per_image uses the 2*MAC convention for roofline math.
    cfg = get_config("vit_b_16_224")
    macs = cfg.flops_per_image / 2
    assert 17.0e9 < macs < 18.2e9


def test_vit_l_tokens():
    assert get_config("vit_l_16_384").num_tokens == 577


def test_validation_errors():
    with pytest.raises(ValueError, match="divisible"):
        ViTConfig(name="bad", img_size=225)
    with pytest.raises(ValueError, match="divisible"):
        ViTConfig(name="bad", embed_dim=100, num_heads=3)
    with pytest.raises(ValueError, match="head_type"):
        ViTConfig(name="bad", head_type="pool")
    with pytest.raises(ValueError, match="num_prefix_tokens"):
        ViTConfig(name="bad", head_type="cls+dist", num_prefix_tokens=1)
    with pytest.raises(KeyError, match="unknown preset"):
        get_config("vit_g_14")


def test_all_presets_valid():
    for name, cfg in PRESETS.items():
        assert cfg.num_tokens > cfg.num_prefix_tokens
        assert cfg.flops_per_image > 0


def test_vit_g_geometry():
    """ViT-G/14 (Zhai et al. 2022): 1664 wide, 48 deep, MLP 8192 (not 4*D),
    head_dim 104, ~1.84B params — the giant class the W8A8 fused path fits
    on one chip (36.6 MB/layer int8 < the 40 MB VMEM gate; bf16 does not)."""
    from vit_with_opencl_tpu.ops import fused_block

    cfg = get_config("vit_g_14_224")
    assert cfg.hidden_dim == 8192
    assert cfg.head_dim == 104
    assert cfg.num_tokens == 257
    d, h = cfg.embed_dim, cfg.hidden_dim
    n_params = cfg.depth * (d * 3 * d + d * d + 2 * d * h)
    assert 1.8e9 < n_params < 1.9e9
    assert fused_block.supports(cfg, dtype_bytes=1)
    assert not fused_block.supports(cfg, dtype_bytes=2)
