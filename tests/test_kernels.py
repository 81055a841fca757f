"""Per-kernel unit tests (Pallas interpret mode vs the golden ops).

This makes the reference's implicit strategy explicit: its kernel unit tests
(``test_linear_layer``) exist only as commented-out stubs
(reference: ViT_opencl.c:121-123); here every kernel is tested against the
fp32 golden op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.models import golden
from vit_with_opencl_tpu.ops import attention, layernorm, linear, softmax

CFG = ViTConfig(
    name="k_small", img_size=32, patch_size=8, embed_dim=64, depth=1,
    num_heads=4, num_classes=11,
)


def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# flash attention
# ---------------------------------------------------------------------------


def _ref_attention(q, k, v, hd):
    """Plain-numpy attention (per-head softmax(QK^T/sqrt(hd))V)."""
    s = (q @ np.swapaxes(k, -1, -2)) / np.sqrt(hd)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return p @ v


@pytest.mark.parametrize("t", [197, 128, 577, 64])
def test_flash_attention_matches_reference(t):
    r = rng()
    b, h, hd = 2, CFG.num_heads, CFG.head_dim
    q = r.standard_normal((b, h, t, hd)).astype(np.float32)
    k = r.standard_normal((b, h, t, hd)).astype(np.float32)
    v = r.standard_normal((b, h, t, hd)).astype(np.float32)
    out = attention.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), CFG, interpret=True
    )
    ref = _ref_attention(q, k, v, hd)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_flash_attention_beyond_reference_cap():
    """seq > 256 — impossible for the reference kernel (multihead.cl:81-83)."""
    r = rng()
    t = 384  # > 256
    q = r.standard_normal((1, 2, t, 64)).astype(np.float32)
    k = r.standard_normal((1, 2, t, 64)).astype(np.float32)
    v = r.standard_normal((1, 2, t, 64)).astype(np.float32)
    out = attention.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), CFG, interpret=True
    )
    ref = _ref_attention(q, k, v, CFG.head_dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.mark.parametrize("t", [197, 577])
def test_blockwise_attention_matches_single_pass(t):
    """The online-softmax blockwise path (used past SINGLE_PASS_MAX_T) must
    agree with the single-pass path at any length."""
    r = rng()
    q = r.standard_normal((1, 3, t, 64)).astype(np.float32)
    k = r.standard_normal((1, 3, t, 64)).astype(np.float32)
    v = r.standard_normal((1, 3, t, 64)).astype(np.float32)
    blockwise = attention._blockwise_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), CFG, interpret=True
    )
    ref = _ref_attention(q, k, v, CFG.head_dim)
    np.testing.assert_allclose(np.asarray(blockwise), ref, atol=2e-5)


def _ref_packed(qkv, nh, hd):
    b, t, _ = qkv.shape
    d = nh * hd
    out = np.zeros((b, t, d), np.float32)
    for i in range(b):
        for h in range(nh):
            q = qkv[i, :, h * hd:(h + 1) * hd] / np.sqrt(hd)
            k = qkv[i, :, d + h * hd: d + (h + 1) * hd]
            v = qkv[i, :, 2 * d + h * hd: 2 * d + (h + 1) * hd]
            s = q @ k.T
            s -= s.max(1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(1, keepdims=True)
            out[i, :, h * hd:(h + 1) * hd] = p @ v
    return out


def test_packed_attention_ragged_route():
    """Small blocks take the unpadded (ragged-tile) route."""
    r = rng()
    qkv = r.standard_normal((2, 197, 3 * 64)).astype(np.float32)
    cfg = ViTConfig(name="t", img_size=32, patch_size=8, embed_dim=64,
                    depth=1, num_heads=4)
    out = attention.packed_fused_attention(jnp.asarray(qkv), cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref_packed(qkv, 4, 16), atol=2e-5
    )


def test_packed_attention_padded_route():
    """Big blocks (ViT-L @384 shape) take the padded+masked route."""
    r = rng()
    nh, hd, t = 16, 64, 577
    d = nh * hd
    cfg = ViTConfig(name="l", img_size=384, patch_size=16, embed_dim=d,
                    depth=1, num_heads=nh)
    qkv = (r.standard_normal((1, t, 3 * d)) * 0.3).astype(np.float32)
    # fp32 qkv block = 577*3072*4 = 7.1 MB > 2 MB threshold → padded route.
    out = attention.packed_fused_attention(jnp.asarray(qkv), cfg, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _ref_packed(qkv, nh, hd), atol=2e-5
    )


def test_packed_attention_per_head_packing():
    """per_head packing ([h0:(q|k|v), h1:(q|k|v), ...], the TP layout) must
    agree with slab packing after reordering columns."""
    r = rng()
    nh, hd, t = 4, 16, 33
    d = nh * hd
    cfg = ViTConfig(name="t", img_size=32, patch_size=8, embed_dim=64,
                    depth=1, num_heads=nh)
    qkv_slab = r.standard_normal((2, t, 3 * d)).astype(np.float32)
    # reorder slab -> per_head
    per_head = np.concatenate(
        [
            np.concatenate(
                [
                    qkv_slab[:, :, s * d + h * hd:s * d + (h + 1) * hd]
                    for s in range(3)
                ],
                axis=-1,
            )
            for h in range(nh)
        ],
        axis=-1,
    )
    a = attention.packed_fused_attention(jnp.asarray(qkv_slab), cfg,
                                         interpret=True)
    b = attention.packed_fused_attention(
        jnp.asarray(per_head), num_heads=nh, head_dim=hd, packing="per_head",
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_single_pass_heads_per_cell_divisor():
    """n=b*h not divisible by the default heads-per-cell must still work."""
    r = rng()
    q = r.standard_normal((1, 3, 197, 64)).astype(np.float32)  # n=3 (prime)
    k = r.standard_normal((1, 3, 197, 64)).astype(np.float32)
    v = r.standard_normal((1, 3, 197, 64)).astype(np.float32)
    out = attention._single_pass_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), CFG, interpret=True
    )
    ref = _ref_attention(q, k, v, CFG.head_dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_flash_attention_bf16():
    r = rng()
    q = r.standard_normal((1, 4, 197, 16)).astype(np.float32)
    k = r.standard_normal((1, 4, 197, 16)).astype(np.float32)
    v = r.standard_normal((1, 4, 197, 16)).astype(np.float32)
    cfg = ViTConfig(name="t", img_size=32, patch_size=8, embed_dim=64,
                    depth=1, num_heads=4)
    out = attention.flash_attention(
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16),
        cfg,
        interpret=True,
    )
    ref = _ref_attention(q, k, v, cfg.head_dim)
    assert np.abs(np.asarray(out, np.float32) - ref).max() < 0.05


# ---------------------------------------------------------------------------
# fused linear
# ---------------------------------------------------------------------------


def test_fused_linear_matches_golden():
    r = rng()
    x = r.standard_normal((197, 128)).astype(np.float32)
    w = (r.standard_normal((256, 128)) * 0.1).astype(np.float32)  # [out, in]
    b = r.standard_normal(256).astype(np.float32)
    out = linear.fused_linear(
        jnp.asarray(x), jnp.asarray(w.T.copy()), jnp.asarray(b),
        block_m=64, block_n=128, block_k=128, interpret=True,
    )
    ref = golden.linear(x, w, b)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_fused_linear_gelu_epilogue():
    r = rng()
    x = r.standard_normal((64, 128)).astype(np.float32)
    w = (r.standard_normal((128, 128)) * 0.1).astype(np.float32)
    b = r.standard_normal(128).astype(np.float32)
    out = linear.fused_linear(
        jnp.asarray(x), jnp.asarray(w.T.copy()), jnp.asarray(b),
        fuse_gelu=True, block_m=64, block_n=128, block_k=128, interpret=True,
    )
    ref = golden.gelu(golden.linear(x, w, b))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_fused_linear_ragged_rows():
    """M=197 (ragged vs any tile) must zero-pad like the reference GEMM
    (ll.cl:37-51) and slice back."""
    r = rng()
    x = r.standard_normal((3, 197, 128)).astype(np.float32)
    w = (r.standard_normal((128, 128)) * 0.1).astype(np.float32)
    b = np.zeros(128, np.float32)
    out = linear.fused_linear(
        jnp.asarray(x), jnp.asarray(w.T.copy()), jnp.asarray(b),
        block_m=256, block_n=128, block_k=128, interpret=True,
    )
    assert out.shape == (3, 197, 128)
    ref = golden.linear(x.reshape(-1, 128), w, b).reshape(3, 197, 128)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_fused_linear_classifier_head_shape():
    """The 1000-class head (N not a multiple of any tile) must pad and slice
    like the reference GEMM's ragged-tile zero-fill (ll.cl:37-51)."""
    r = rng()
    x = r.standard_normal((9, 768)).astype(np.float32)
    w = (r.standard_normal((1000, 768)) * 0.05).astype(np.float32)  # [out, in]
    b = r.standard_normal(1000).astype(np.float32)
    out = linear.fused_linear(
        jnp.asarray(x), jnp.asarray(w.T.copy()), jnp.asarray(b), interpret=True
    )
    assert out.shape == (9, 1000)
    np.testing.assert_allclose(np.asarray(out), golden.linear(x, w, b), atol=2e-4)


# ---------------------------------------------------------------------------
# layernorm (+ fused residual)
# ---------------------------------------------------------------------------


def test_layer_norm_matches_golden():
    r = rng()
    x = r.standard_normal((2, 197, 128)).astype(np.float32)
    w = r.standard_normal(128).astype(np.float32)
    b = r.standard_normal(128).astype(np.float32)
    out = layernorm.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               1e-6, interpret=True)
    ref = golden.layer_norm(x, w, b, 1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_residual_layer_norm_fusion():
    r = rng()
    x = r.standard_normal((197, 128)).astype(np.float32)
    res = r.standard_normal((197, 128)).astype(np.float32)
    w = np.ones(128, np.float32)
    b = np.zeros(128, np.float32)
    out, summed = layernorm.residual_layer_norm(
        jnp.asarray(x), jnp.asarray(res), jnp.asarray(w), jnp.asarray(b),
        1e-6, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(summed), x + res, atol=1e-6)
    ref = golden.layer_norm(x + res, w, b, 1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# softmax
# ---------------------------------------------------------------------------


def test_softmax_matches_golden_and_handles_1000_plus():
    r = rng()
    # The reference softmax kernel caps classes at 1024 (miniSoftMax.cl:7-9);
    # ours must handle more.
    for n in (1000, 4096):
        x = (r.standard_normal((3, n)) * 5).astype(np.float32)
        out = softmax(jnp.asarray(x))
        ref = golden.softmax(x)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end with the Pallas kernel table
# ---------------------------------------------------------------------------


def test_forward_with_flash_kernels_matches_golden():
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit

    params = fixtures.random_params(CFG, seed=2, scale=0.05)
    images = fixtures.random_images(CFG, n=2, seed=2)
    ref = golden.golden_forward(images, params, CFG)
    stacked = vit.stack_params(params, CFG, param_dtype=jnp.float32)
    kernels = vit.resolve_kernels("flash")
    probs = vit.forward(
        jnp.asarray(images), stacked, CFG, compute_dtype=jnp.float32,
        kernels=kernels,
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


@pytest.mark.parametrize("t", [197, 64])
def test_ring_attention_matches_reference(t):
    """Ring attention over a 4-device ring == plain attention (incl. a T that
    doesn't divide the ring and needs masked padding)."""
    import jax
    from jax.sharding import Mesh
    from vit_with_opencl_tpu.ops import ring_attention as ra

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("model",))
    r = rng()
    q = r.standard_normal((2, 3, t, 32)).astype(np.float32)
    k = r.standard_normal((2, 3, t, 32)).astype(np.float32)
    v = r.standard_normal((2, 3, t, 32)).astype(np.float32)
    cfg = ViTConfig(name="r", img_size=32, patch_size=8, embed_dim=96,
                    depth=1, num_heads=3)
    # cfg.head_dim is 32 for this config
    out = ra.ring_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            cfg, mesh)
    ref = _ref_attention(q / np.sqrt(cfg.head_dim) * np.sqrt(cfg.head_dim),
                         k, v, cfg.head_dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_packed_attention_trainable_grads():
    """Custom-VJP flash: Pallas forward, rematerialized XLA backward — grads
    must match differentiating the pure-jnp math directly."""
    from vit_with_opencl_tpu.ops.attention import (
        _packed_reference_math,
        packed_fused_attention_trainable,
    )

    r = rng()
    nh, hd, t = 4, 16, 33
    qkv = jnp.asarray(r.standard_normal((2, t, 3 * nh * hd)).astype(np.float32))

    def loss_pallas(x):
        return jnp.sum(packed_fused_attention_trainable(x, nh, hd) ** 2)

    def loss_ref(x):
        return jnp.sum(_packed_reference_math(x, nh, hd) ** 2)

    v_p, g_p = jax.value_and_grad(loss_pallas)(qkv)
    v_r, g_r = jax.value_and_grad(loss_ref)(qkv)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=1e-4)


def test_packed_attention_trainable_ipc_knobs():
    """The autotune launch knobs (fwd / bwd images-per-cell) reshape the
    kernel grid only — value and grads must match the default launch
    bit-for-bit-closely for every (fwd, bwd) combination, including a
    non-divisor (clamped down) candidate."""
    import functools

    from vit_with_opencl_tpu.ops.attention import (
        packed_fused_attention_trainable,
    )

    r = rng()
    nh, hd, t = 4, 16, 33
    qkv = jnp.asarray(
        r.standard_normal((4, t, 3 * nh * hd)).astype(np.float32))

    def loss(x, fwd_ipc=None, bwd_ipc=None):
        return jnp.sum(
            packed_fused_attention_trainable(x, nh, hd, fwd_ipc, bwd_ipc)
            ** 2)

    v0, g0 = jax.value_and_grad(loss)(qkv)
    for fwd_ipc, bwd_ipc in ((2, 2), (4, 1), (1, 4), (3, 3)):
        v, g = jax.value_and_grad(
            functools.partial(loss, fwd_ipc=fwd_ipc, bwd_ipc=bwd_ipc))(qkv)
        np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0), atol=1e-5)


def test_packed_attention_bwd_ipc_parity():
    """packed_attention_bwd with images_per_cell > 1 (the training autotune
    knob) returns the same dqkv as the default single-image grid."""
    from vit_with_opencl_tpu.ops.attention import packed_attention_bwd

    r = rng()
    nh, hd, t = 4, 16, 40
    qkv = jnp.asarray(
        r.standard_normal((4, t, 3 * nh * hd)).astype(np.float32))
    do = jnp.asarray(r.standard_normal((4, t, nh * hd)).astype(np.float32))
    base = packed_attention_bwd(qkv, do, nh, hd)
    for ipc in (2, 4):
        out = packed_attention_bwd(qkv, do, nh, hd, images_per_cell=ipc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-6)


def test_fused_block_matches_golden_forward():
    """Whole-layer fused kernel end-to-end (fused_block path) vs golden."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod

    cfg = ViTConfig(name="fb", img_size=32, patch_size=8, embed_dim=64,
                    depth=2, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=6, scale=0.05)
    images = fixtures.random_images(cfg, n=2, seed=6)
    ref = golden.golden_forward(images, params, cfg)
    stacked = vitmod.stack_params(params, cfg, param_dtype=jnp.float32)
    kern = vitmod.resolve_kernels("fused_block")
    probs = vitmod.forward(jnp.asarray(images), stacked, cfg,
                           compute_dtype=jnp.float32, kernels=kern)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_fused_block_stage_major_parity():
    """Stage-major scheduling (round 4: adjacent independent VPU/MXU work
    across the cell's image streams) reorders program statements only — the
    per-stream math is untouched, so outputs must match the image-major
    order exactly, for bf16, W8A8, and outlier-aware W8A8 params."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import quant
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="sm", img_size=32, patch_size=8, embed_dim=64,
                    depth=2, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=13, scale=0.05)
    images = fixtures.random_images(cfg, n=2, seed=13)
    stacked = vitmod.stack_params(params, cfg, param_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(13).normal(
        0, 0.4, (4, cfg.num_tokens, cfg.embed_dim)).astype(np.float32))

    variants = {
        "bf16": (stacked, False),
        "w8a8": (quant.quantize_stacked_params(stacked, cfg), True),
        "w8a8-outlier": (jax.tree.map(
            jnp.asarray, quant.calibrate_w8a8(images, stacked, cfg)), True),
    }
    for name, (p, w8a8) in variants.items():
        lp = jax.tree.map(lambda a: a[0], p["layers"])
        base = fused_block.fused_encoder_layer(
            x, lp, cfg, images_per_cell=2, w8a8=w8a8, stage_major=False)
        staged = fused_block.fused_encoder_layer(
            x, lp, cfg, images_per_cell=2, w8a8=w8a8, stage_major=True)
        np.testing.assert_array_equal(
            np.asarray(base), np.asarray(staged), err_msg=name)


def test_fused_block_stage_major_group_parity():
    """The layer-group kernel (depth>1 per launch) takes the same
    stage-major path through _block_kernel — parity must hold there too
    (W8A8, 2-layer groups, 2-image cells)."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import quant
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="smg", img_size=32, patch_size=8, embed_dim=64,
                    depth=4, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=14, scale=0.05)
    stacked = quant.quantize_stacked_params(
        vitmod.stack_params(params, cfg, param_dtype=jnp.float32), cfg)
    x = jnp.asarray(np.random.default_rng(14).normal(
        0, 0.4, (4, cfg.num_tokens, cfg.embed_dim)).astype(np.float32))
    grouped = jax.tree.map(
        lambda a: a.reshape((2, 2) + a.shape[1:]), stacked["layers"])
    g0 = jax.tree.map(lambda a: a[0], grouped)
    base = fused_block._group_call(x, g0, cfg, 2, 2, True, w8a8=True,
                                   stage_major=False)
    staged = fused_block._group_call(x, g0, cfg, 2, 2, True, w8a8=True,
                                     stage_major=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(staged))


def test_fused_block_w8a8_head_dim_104():
    """ViT-G/14's head_dim is 104 (1664/16) — neither 64 nor a power of
    two. The W8A8 fused layer must stay within the comparator gate at that
    geometry (interpret)."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import golden, quant
    from vit_with_opencl_tpu.models import vit as vitmod

    cfg = ViTConfig(name="g_small", img_size=32, patch_size=8, embed_dim=208,
                    depth=2, num_heads=2, num_classes=9)
    assert cfg.head_dim == 104
    params = fixtures.random_params(cfg, seed=11, scale=0.05)
    images = fixtures.random_images(cfg, n=2, seed=11)
    ref = golden.golden_forward(images, params, cfg)
    stacked = quant.quantize_stacked_params(
        vitmod.stack_params(params, cfg, param_dtype=jnp.float32), cfg)
    kern = vitmod.resolve_kernels("fused_block", w8a8=True)
    probs = vitmod.forward(jnp.asarray(images), stacked, cfg,
                           compute_dtype=jnp.float32, kernels=kern)
    assert float(np.abs(np.asarray(probs) - ref).max()) < 1e-2


def test_fused_block_supports_gate():
    from vit_with_opencl_tpu.ops import fused_block
    from vit_with_opencl_tpu import get_config

    assert fused_block.supports(get_config("vit_tiny_16_224"))
    # ViT-B (14.2 MB/layer) and ViT-L (25.2 MB/layer) fit since the
    # measured gate raises; both were probed faster than per-op on v5e.
    assert fused_block.supports(get_config("vit_b_16_224"))
    assert fused_block.supports(get_config("vit_l_16_384"))
    # ViT-H/14 (39.3 MB/layer bf16, 19.7 MB int8): both probed faster than
    # per-op in round 3 (+6% bf16, +10% int8).
    assert fused_block.supports(get_config("vit_h_14_224"))
    assert fused_block.supports(get_config("vit_h_14_224"), dtype_bytes=1)


def test_packed_bwd_padded_route_grads():
    """Backward through the padded (big-block) route: ViT-L-shaped heads at
    577 tokens must match the reference-math gradients (fp32 interpret)."""
    from vit_with_opencl_tpu.ops.attention import (
        _packed_reference_math,
        packed_fused_attention_trainable,
    )

    r = rng()
    nh, hd, t = 16, 64, 577  # qkv block > 2MB → padded route both directions
    qkv = jnp.asarray((r.standard_normal((1, t, 3 * nh * hd)) * 0.3)
                      .astype(np.float32))

    g_p = jax.grad(lambda x: jnp.sum(
        packed_fused_attention_trainable(x, nh, hd) ** 2))(qkv)
    g_r = jax.grad(lambda x: jnp.sum(
        _packed_reference_math(x, nh, hd) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=2e-4)


# ---------------------------------------------------------------------------
# Blockwise (long-sequence) attention: forward + TRUE flash backward.
# The packed backward rematerializes [T, T] per head; past the single-pass
# regime the custom VJP must route to the blockwise kernels instead, which
# reconstruct probabilities tile-by-tile from the saved log-sum-exp.
# ---------------------------------------------------------------------------


def test_packed_inference_long_seq_routes_blockwise():
    """packed_fused_attention past SINGLE_PASS_MAX_T must reroute to the
    blockwise kernel and still match the reference math."""
    from vit_with_opencl_tpu.ops.attention import (
        SINGLE_PASS_MAX_T,
        _packed_reference_math,
        packed_fused_attention,
    )

    r = rng()
    nh, hd, t = 2, 64, SINGLE_PASS_MAX_T + 313  # odd tail → padded tiles
    qkv = jnp.asarray((r.standard_normal((1, t, 3 * nh * hd)) * 0.4)
                      .astype(np.float32))
    out = packed_fused_attention(qkv, num_heads=nh, head_dim=hd)
    ref = _packed_reference_math(qkv, nh, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_blockwise_fwd_t8192():
    """T=8192 forward through the blockwise (online-softmax) route — the
    regime the reference's seq<=256 kernel (multihead.cl:81-83) could never
    reach; keeps the long-context claim honest at real scale."""
    from vit_with_opencl_tpu.ops.attention import (
        _packed_reference_math,
        packed_fused_attention,
    )

    r = rng()
    nh, hd, t = 1, 64, 8192
    qkv = jnp.asarray((r.standard_normal((1, t, 3 * nh * hd)) * 0.2)
                      .astype(np.float32))
    out = packed_fused_attention(qkv, num_heads=nh, head_dim=hd)
    ref = _packed_reference_math(qkv, nh, hd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("t", [2048, 4096])
def test_blockwise_bwd_long_seq_grads(t):
    """Long-sequence training gradients: the blockwise custom-VJP route
    (no [T, T] residency) vs differentiating the pure-jnp math."""
    from vit_with_opencl_tpu.ops.attention import (
        _packed_reference_math,
        packed_fused_attention_trainable,
    )

    r = rng()
    nh, hd = 1, 64
    qkv = jnp.asarray((r.standard_normal((1, t, 3 * nh * hd)) * 0.3)
                      .astype(np.float32))

    def loss_pallas(x):
        return jnp.sum(jnp.cos(packed_fused_attention_trainable(x, nh, hd)))

    def loss_ref(x):
        return jnp.sum(jnp.cos(_packed_reference_math(x, nh, hd)))

    v_p, g_p = jax.value_and_grad(loss_pallas)(qkv)
    v_r, g_r = jax.value_and_grad(loss_ref)(qkv)
    np.testing.assert_allclose(float(v_p), float(v_r), rtol=1e-5)
    scale = float(np.abs(np.asarray(g_r)).max())
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               atol=1e-4 * max(scale, 1.0))


def test_blockwise_bwd_ragged_tail_grads():
    """Gradients through the long route with a non-multiple-of-128 length:
    padded dO rows must contribute exactly zero gradient."""
    from vit_with_opencl_tpu.ops.attention import (
        _packed_reference_math,
        packed_fused_attention_trainable,
    )

    r = rng()
    nh, hd, t = 2, 32, 1537  # pads to 1664
    qkv = jnp.asarray((r.standard_normal((1, t, 3 * nh * hd)) * 0.3)
                      .astype(np.float32))
    g_p = jax.grad(lambda x: jnp.sum(
        packed_fused_attention_trainable(x, nh, hd) ** 2))(qkv)
    g_r = jax.grad(lambda x: jnp.sum(
        _packed_reference_math(x, nh, hd) ** 2))(qkv)
    scale = float(np.abs(np.asarray(g_r)).max())
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               atol=1e-4 * max(scale, 1.0))


def test_blockwise_fwd_lse_matches_logsumexp():
    """The saved residual must be the exact per-row softmax log-normalizer."""
    from vit_with_opencl_tpu.ops import attention as A

    r = rng()
    n, t, hd = 2, 256, 64
    q = jnp.asarray(r.standard_normal((n, t, hd)).astype(np.float32))
    k = jnp.asarray(r.standard_normal((n, t, hd)).astype(np.float32))
    v = jnp.asarray(r.standard_normal((n, t, hd)).astype(np.float32))
    scale = 1.0 / np.sqrt(hd)
    out, lse = A._blockwise_fwd_flat(
        q, k, v, scale=scale, seq_len=t, block_q=128, block_k=128,
        interpret=True, return_lse=True,
    )
    s = jnp.einsum("ntd,nsd->nts", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               atol=1e-4)


def test_fused_encoder_stack_matches_golden():
    """Whole-encoder fused kernel (every layer in one launch) end-to-end."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="fstk", img_size=32, patch_size=8, embed_dim=64,
                    depth=3, num_heads=4, num_classes=9)
    assert fused_block.supports_stack(cfg)
    params = fixtures.random_params(cfg, seed=11, scale=0.05)
    images = fixtures.random_images(cfg, n=4, seed=11)
    ref = golden.golden_forward(images, params, cfg)
    stacked = vitmod.stack_params(params, cfg, param_dtype=jnp.float32)
    kern = vitmod.resolve_kernels("flash")
    probs = vitmod.forward(jnp.asarray(images), stacked, cfg,
                           compute_dtype=jnp.float32, kernels=kern)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_fused_layer_flat_matches_golden():
    """Flat-M per-layer variant (stack kernel at num_layers=1) end-to-end."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="ffl", img_size=32, patch_size=8, embed_dim=64,
                    depth=2, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=3, scale=0.05)
    images = fixtures.random_images(cfg, n=4, seed=3)
    ref = golden.golden_forward(images, params, cfg)
    stacked = vitmod.stack_params(params, cfg, param_dtype=jnp.float32)
    kern = vitmod.resolve_kernels("flash")
    kern["encoder_block"] = fused_block.fused_encoder_layer_flat
    probs = vitmod.forward(jnp.asarray(images), stacked, cfg,
                           compute_dtype=jnp.float32, kernels=kern)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_fused_group_matches_golden():
    """Layer-group fusion (2 layers/launch) end-to-end vs golden."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod

    cfg = ViTConfig(name="fgrp", img_size=32, patch_size=8, embed_dim=64,
                    depth=4, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=4, scale=0.05)
    images = fixtures.random_images(cfg, n=4, seed=4)
    ref = golden.golden_forward(images, params, cfg)
    stacked = vitmod.stack_params(params, cfg, param_dtype=jnp.float32)
    kern = vitmod.resolve_kernels("flash")
    kern["fused_group_size"] = 2
    probs = vitmod.forward(jnp.asarray(images), stacked, cfg,
                           compute_dtype=jnp.float32, kernels=kern)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_fused_stack_supports_gate():
    from vit_with_opencl_tpu import get_config
    from vit_with_opencl_tpu.ops import fused_block

    assert fused_block.supports_stack(get_config("vit_tiny_16_224"))
    assert fused_block.supports_stack(get_config("vit_s_16_224"))
    assert not fused_block.supports_stack(get_config("vit_b_16_224"))


# ---------------------------------------------------------------------------
# trainable fused encoder layer (custom VJP, fused rematerializing backward)
# ---------------------------------------------------------------------------


def _jnp_fused_layer_math(x, lp, cfg):
    """Pure-jnp transcription of _block_kernel's math (incl. _gelu_fast), so
    jax.grad of THIS is the oracle for the hand-written fused backward."""
    from vit_with_opencl_tpu.ops import fused_block as fb

    nh, hd = cfg.num_heads, cfg.head_dim
    scale = 1.0 / np.sqrt(hd)

    def ln(xf, w, b):
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(xf * xf, -1, keepdims=True) - mean * mean
        return (xf - mean) * jax.lax.rsqrt(var + cfg.eps) * w + b

    def one(x0):
        h = ln(x0, lp["ln1_w"], lp["ln1_b"])
        qkv = h @ lp["qkv_w"] + lp["qkv_b"]
        parts = []
        for hh in range(nh):
            qo, ko, vo = attention._packed_offsets("slab", hh, nh, hd)
            q, k, v = (qkv[:, o:o + hd] for o in (qo, ko, vo))
            p = jax.nn.softmax((q * scale) @ k.T, axis=-1)
            parts.append(p @ v)
        ctx = jnp.concatenate(parts, -1)
        x2 = x0 + ctx @ lp["out_w"] + lp["out_b"]
        h2 = ln(x2, lp["ln2_w"], lp["ln2_b"])
        hid = fb._gelu_fast(h2 @ lp["fc1_w"] + lp["fc1_b"])
        return x2 + hid @ lp["fc2_w"] + lp["fc2_b"]

    return jax.vmap(one)(x)


def test_gelu_fast_grad_matches_autodiff():
    from vit_with_opencl_tpu.ops import fused_block as fb

    x = jnp.linspace(-6.0, 6.0, 997, dtype=jnp.float32)
    want = jax.vmap(jax.grad(fb._gelu_fast))(x)
    got = fb._gelu_fast_grad(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_layer_trainable_grads():
    """Fused fwd + fused rematerializing bwd vs jax.grad of the same math.

    b=3 with images_per_cell=1 also exercises weight-grad accumulation
    across the (sequential) batch grid."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="ftr", img_size=32, patch_size=8, embed_dim=64,
                    depth=1, num_heads=4, num_classes=9)
    named = fixtures.random_params(cfg, seed=7, scale=0.05)
    stacked = vitmod.stack_params(named, cfg, param_dtype=jnp.float32)
    lp = jax.tree.map(lambda a: jnp.asarray(a[0]), stacked["layers"])
    r = rng()
    x = jnp.asarray(
        r.standard_normal((3, cfg.num_tokens, cfg.embed_dim)), jnp.float32
    )

    def loss_fused(x, lp):
        out = fused_block.fused_encoder_layer_trainable(x, lp, cfg)
        return jnp.sum(out * out)

    def loss_ref(x, lp):
        out = _jnp_fused_layer_math(x, lp, cfg)
        return jnp.sum(out * out)

    v_f, (gx_f, glp_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, lp)
    v_r, (gx_r, glp_r) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, lp)
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)

    def tol(ref):
        return 1e-4 * max(1.0, float(np.abs(ref).max()))

    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=tol(np.asarray(gx_r)))
    for key in glp_r:
        ref = np.asarray(glp_r[key])
        np.testing.assert_allclose(
            np.asarray(glp_f[key]), ref, atol=tol(ref),
            err_msg=f"grad mismatch for layer param {key!r}",
        )


def test_fused_layer_trainable_under_scan():
    """The training path consumes the layer via lax.scan over stacked params —
    grads must flow through scan + custom_vjp together."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="ftr2", img_size=32, patch_size=8, embed_dim=64,
                    depth=2, num_heads=4, num_classes=9)
    named = fixtures.random_params(cfg, seed=8, scale=0.05)
    stacked = vitmod.stack_params(named, cfg, param_dtype=jnp.float32)
    layers = jax.tree.map(jnp.asarray, stacked["layers"])
    r = rng()
    x = jnp.asarray(
        r.standard_normal((2, cfg.num_tokens, cfg.embed_dim)), jnp.float32
    )

    def loss(x, layers, layer_fn):
        def body(h, lp):
            return layer_fn(h, lp, cfg), None

        out, _ = jax.lax.scan(body, x, layers)
        return jnp.sum(out * out)

    v_f, g_f = jax.value_and_grad(loss, argnums=1)(
        x, layers, fused_block.fused_encoder_layer_trainable
    )
    v_r, g_r = jax.value_and_grad(loss, argnums=1)(
        x, layers, lambda h, lp, c: _jnp_fused_layer_math(h, lp, c)
    )
    np.testing.assert_allclose(float(v_f), float(v_r), rtol=1e-5)
    for key in g_r:
        ref = np.asarray(g_r[key])
        atol = 1e-4 * max(1.0, float(np.abs(ref).max()))
        np.testing.assert_allclose(np.asarray(g_f[key]), ref, atol=atol,
                                   err_msg=f"scan grad mismatch for {key!r}")


def test_supports_trainable_gate():
    from vit_with_opencl_tpu import get_config
    from vit_with_opencl_tpu.ops import fused_block

    assert fused_block.supports_trainable(get_config("vit_b_16_224"))
    assert fused_block.supports_trainable(get_config("vit_tiny_16_224"))
    # ViT-L/H qualify since the H-chunked MLP wgrad split: the MLP fp32
    # accumulators no longer need to fit whole; only the attention-side
    # residency gates (25.2 / 39.3 MB, both under the 52 MB budget).
    assert fused_block.supports_trainable(get_config("vit_l_16_384"))
    assert fused_block.supports_trainable(get_config("vit_h_14_224"))
    assert fused_block._pick_mlp_chunks(1024, 4096, 2) == 2   # ViT-L
    assert fused_block._pick_mlp_chunks(1280, 5120, 2) == 2   # ViT-H
    assert fused_block._pick_mlp_chunks(768, 3072, 2) == 1    # ViT-B


def test_fused_layer_bwd_mlp_chunked_matches_single():
    """The H-chunked light/wgrad MLP backward (ViT-L/H path) must produce
    the same gradients as the single-kernel path on identical inputs."""
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.ops import fused_block

    cfg = ViTConfig(name="fch", img_size=32, patch_size=8, embed_dim=64,
                    depth=1, num_heads=4, num_classes=9)
    named = fixtures.random_params(cfg, seed=13, scale=0.05)
    stacked = vitmod.stack_params(named, cfg, param_dtype=jnp.float32)
    lp = jax.tree.map(lambda a: jnp.asarray(a[0]), stacked["layers"])
    r = rng()
    x = jnp.asarray(
        r.standard_normal((3, cfg.num_tokens, cfg.embed_dim)), jnp.float32)
    dout = jnp.asarray(
        r.standard_normal((3, cfg.num_tokens, cfg.embed_dim)), jnp.float32)

    dx1, dlp1 = fused_block.fused_encoder_layer_bwd(
        x, lp, dout, cfg, mlp_chunks=1)
    for nc in (2, 4):
        dxn, dlpn = fused_block.fused_encoder_layer_bwd(
            x, lp, dout, cfg, mlp_chunks=nc)
        np.testing.assert_allclose(np.asarray(dxn), np.asarray(dx1),
                                   atol=1e-5)
        for key in dlp1:
            np.testing.assert_allclose(
                np.asarray(dlpn[key]), np.asarray(dlp1[key]), atol=1e-5,
                err_msg=f"chunked ({nc}) grad mismatch for {key!r}")
    with pytest.raises(ValueError, match="must divide"):
        fused_block.fused_encoder_layer_bwd(x, lp, dout, cfg, mlp_chunks=7)


# ---------------------------------------------------------------------------
# ring attention — blockwise Pallas local step
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t", [512, 420])
def test_ring_attention_blockwise_matches_einsum(t):
    """Ring with the carry-in/carry-out flash local step == einsum ring ==
    plain attention (incl. a T that doesn't divide the ring: per-shard
    prefix masking)."""
    import jax
    from jax.sharding import Mesh
    from vit_with_opencl_tpu.ops import ring_attention as ra

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("model",))
    r = rng()
    q = r.standard_normal((1, 2, t, 64)).astype(np.float32)
    k = r.standard_normal((1, 2, t, 64)).astype(np.float32)
    v = r.standard_normal((1, 2, t, 64)).astype(np.float32)
    cfg = ViTConfig(name="rb", img_size=32, patch_size=8, embed_dim=256,
                    depth=1, num_heads=4)
    outs = {}
    for impl in ("einsum", "blockwise"):
        outs[impl] = np.asarray(ra.ring_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cfg, mesh,
            impl=impl,
        ))
    ref = _ref_attention(q, k, v, cfg.head_dim)
    np.testing.assert_allclose(outs["einsum"], ref, atol=2e-5)
    np.testing.assert_allclose(outs["blockwise"], ref, atol=2e-5)


def test_blockwise_ring_step_carries_stats():
    """Two chained blockwise_ring_step calls over a split KV == one-shot
    softmax over the concatenated KV (the cross-device rescaling identity)."""
    from vit_with_opencl_tpu.ops import attention as attn

    r = rng()
    t_loc, hd = 128, 32
    q = jnp.asarray(r.standard_normal((1, t_loc, hd)), jnp.float32)
    k = jnp.asarray(r.standard_normal((1, 2 * t_loc, hd)), jnp.float32)
    v = jnp.asarray(r.standard_normal((1, 2 * t_loc, hd)), jnp.float32)
    scale = 0.17
    m = jnp.full((1, t_loc), -jnp.inf, jnp.float32)
    l = jnp.zeros((1, t_loc), jnp.float32)
    acc = jnp.zeros((1, t_loc, hd), jnp.float32)
    bias = jnp.zeros((1, t_loc), jnp.float32)
    m, l, acc = attn.blockwise_ring_step(
        q, k[:, :t_loc], v[:, :t_loc], bias, m, l, acc,
        scale=scale, block_q=64, block_k=64,
    )
    m, l, acc = attn.blockwise_ring_step(
        q, k[:, t_loc:], v[:, t_loc:], bias, m, l, acc,
        scale=scale, block_q=64, block_k=64,
    )
    out = np.asarray(acc / l[..., None])
    s = (np.asarray(q) @ np.swapaxes(np.asarray(k), -1, -2)) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = p @ np.asarray(v)
    np.testing.assert_allclose(out, ref, atol=2e-5)
