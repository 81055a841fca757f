"""Golden model unit tests: op-level semantics vs independent references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vit_with_opencl_tpu import VIT_B_16_224, VIT_TINY_16_224, ViTConfig
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import golden

# A small config keeps the per-op tests fast while exercising every code path.
SMALL = ViTConfig(
    name="small",
    img_size=32,
    patch_size=8,
    embed_dim=48,
    depth=2,
    num_heads=4,
    num_classes=11,
)


def rng():
    return np.random.default_rng(42)


def test_gelu_matches_torch_exact():
    x = rng().standard_normal(1000).astype(np.float32) * 3
    ours = golden.gelu(x)
    theirs = F.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_layer_norm_matches_torch():
    x = rng().standard_normal((7, 48)).astype(np.float32)
    w = rng().standard_normal(48).astype(np.float32)
    b = rng().standard_normal(48).astype(np.float32)
    ours = golden.layer_norm(x, w, b, 1e-6)
    theirs = F.layer_norm(
        torch.from_numpy(x), (48,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_linear_matches_torch():
    x = rng().standard_normal((5, 16)).astype(np.float32)
    w = rng().standard_normal((8, 16)).astype(np.float32)
    b = rng().standard_normal(8).astype(np.float32)
    ours = golden.linear(x, w, b)
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(ours, theirs.numpy(), atol=1e-5)


def test_multihead_attention_matches_torch():
    cfg = SMALL
    d = cfg.embed_dim
    r = rng()
    x = r.standard_normal((9, d)).astype(np.float32)
    in_w = r.standard_normal((3 * d, d)).astype(np.float32) * 0.1
    in_b = r.standard_normal(3 * d).astype(np.float32) * 0.1
    out_w = r.standard_normal((d, d)).astype(np.float32) * 0.1
    out_b = r.standard_normal(d).astype(np.float32) * 0.1
    ours = golden.multihead_attention(x, in_w, in_b, out_w, out_b, cfg)
    theirs, _ = F.multi_head_attention_forward(
        torch.from_numpy(x)[:, None],
        torch.from_numpy(x)[:, None],
        torch.from_numpy(x)[:, None],
        d,
        cfg.num_heads,
        torch.from_numpy(in_w),
        torch.from_numpy(in_b),
        None,
        None,
        False,
        0.0,
        torch.from_numpy(out_w),
        torch.from_numpy(out_b),
        need_weights=False,
    )
    np.testing.assert_allclose(ours, theirs[:, 0].numpy(), atol=1e-5)


def test_patch_embed_matches_torch_conv():
    cfg = SMALL
    r = rng()
    img = r.standard_normal((3, cfg.img_size, cfg.img_size)).astype(np.float32)
    w = r.standard_normal(
        (cfg.embed_dim, 3, cfg.patch_size, cfg.patch_size)
    ).astype(np.float32)
    b = r.standard_normal(cfg.embed_dim).astype(np.float32)
    ours = golden.patch_embed(img, w, b, cfg)  # [num_patches, D]
    conv = F.conv2d(
        torch.from_numpy(img)[None],
        torch.from_numpy(w),
        torch.from_numpy(b),
        stride=cfg.patch_size,
    )[0]  # [D, g, g]
    theirs = conv.reshape(cfg.embed_dim, -1).T.numpy()  # flatten+transpose
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_softmax_stable():
    x = np.array([[1000.0, 1000.0, -1000.0]], np.float32)
    p = golden.softmax(x)
    np.testing.assert_allclose(p, [[0.5, 0.5, 0.0]], atol=1e-6)
    assert np.isfinite(p).all()


def test_golden_forward_full_model_vs_torch():
    """End-to-end: golden model vs an independently-built torch ViT with the
    same weights (torchvision vit_b_16 semantics, reimplemented in torch)."""
    cfg = SMALL
    params = fixtures.random_params(cfg, seed=7, scale=0.05)
    images = fixtures.random_images(cfg, n=2, seed=3)

    ours = golden.golden_forward(images, params, cfg)

    # Torch re-implementation, written against torchvision's VisionTransformer
    # semantics (pre-LN encoder, CLS head).
    def torch_forward(img):
        t = torch.from_numpy(img)[None]
        x = F.conv2d(
            t,
            torch.from_numpy(params["conv_proj_weight"]),
            torch.from_numpy(params["conv_proj_bias"]),
            stride=cfg.patch_size,
        )
        x = x.flatten(2).transpose(1, 2)  # [1, N, D]
        cls = torch.from_numpy(params["class_token"]).reshape(1, 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + torch.from_numpy(params["encoder_pos_embedding"])[None]
        d = cfg.embed_dim
        for l in range(cfg.depth):
            p = f"encoder_layers_encoder_layer_{l}_"
            h = F.layer_norm(
                x,
                (d,),
                torch.from_numpy(params[p + "ln_1_weight"]),
                torch.from_numpy(params[p + "ln_1_bias"]),
                cfg.eps,
            )
            attn, _ = F.multi_head_attention_forward(
                h.transpose(0, 1),
                h.transpose(0, 1),
                h.transpose(0, 1),
                d,
                cfg.num_heads,
                torch.from_numpy(params[p + "self_attention_in_proj_weight"]),
                torch.from_numpy(params[p + "self_attention_in_proj_bias"]),
                None,
                None,
                False,
                0.0,
                torch.from_numpy(params[p + "self_attention_out_proj_weight"]),
                torch.from_numpy(params[p + "self_attention_out_proj_bias"]),
                need_weights=False,
            )
            x = x + attn.transpose(0, 1)
            h = F.layer_norm(
                x,
                (d,),
                torch.from_numpy(params[p + "ln_2_weight"]),
                torch.from_numpy(params[p + "ln_2_bias"]),
                cfg.eps,
            )
            h = F.linear(
                h,
                torch.from_numpy(params[p + "mlp_0_weight"]),
                torch.from_numpy(params[p + "mlp_0_bias"]),
            )
            h = F.gelu(h)
            h = F.linear(
                h,
                torch.from_numpy(params[p + "mlp_3_weight"]),
                torch.from_numpy(params[p + "mlp_3_bias"]),
            )
            x = x + h
        x = F.layer_norm(
            x,
            (d,),
            torch.from_numpy(params["encoder_ln_weight"]),
            torch.from_numpy(params["encoder_ln_bias"]),
            cfg.eps,
        )
        logits = F.linear(
            x[:, 0],
            torch.from_numpy(params["heads_head_weight"]),
            torch.from_numpy(params["heads_head_bias"]),
        )
        return torch.softmax(logits, dim=-1)[0].numpy()

    for i in range(images.shape[0]):
        np.testing.assert_allclose(ours[i], torch_forward(images[i]), atol=1e-5)


def test_golden_deterministic():
    cfg = SMALL
    params = fixtures.random_params(cfg, seed=1)
    images = fixtures.random_images(cfg, n=1, seed=1)
    a = golden.golden_forward(images, params, cfg)
    b = golden.golden_forward(images, params, cfg)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a.sum(axis=-1), 1.0, atol=1e-5)
