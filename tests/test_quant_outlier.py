"""Outlier-robust W8A8: adversarial trained-ViT statistics.

Round 3 proved W8A8 parity only on Gaussian synthetic weights; trained ViTs
carry persistent activation outlier channels that per-token absmax
quantization clips badly (the reference's verification contract is the
comparator gate, /root/reference/MulticoreMainProject/comparator.c:74-86:
exact labels + |prob diff| <= 0.01). This file builds the adversarial regime
explicitly (harness.fixtures.adversarial_params), documents that plain W8A8
breaks the gate AND the labels there, and pins the outlier-aware mode
(models/quant.calibrate_w8a8: channel permutations + bf16 outlier groups)
that recovers both. On-chip throughput/parity for this mode is recorded in
BENCH.md ("Calibrated outlier-aware W8A8"): ViT-B 4965 img/s (-19.9% vs
plain W8A8, parity 1.1e-4), ViT-L@384 517 (-5.7%), ViT-H 576 (-8.1%),
ViT-G/14 1.84B one-chip 233.8 (-5.7%, parity 3.3e-4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.engine import InferenceEngine
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import golden, quant, vit

CFG = ViTConfig(name="adv", img_size=64, patch_size=8, embed_dim=256, depth=12,
                num_heads=4, num_classes=100)
HEADS = (CFG.num_heads, CFG.head_dim)


def _adversarial(head_scale: float, seed: int = 0):
    """Adversarial weights with the classifier head scaled so golden
    predictions are confident enough for prob errors to materialize
    (unscaled synthetic heads give near-uniform probabilities, which is how
    a quantization error can hide — the round-3 trap)."""
    pn = fixtures.adversarial_params(CFG, seed=seed)
    pn["heads_head_weight"] = pn["heads_head_weight"] * head_scale
    return pn


def _w8a8_probs(images, params, kernels):
    return np.asarray(
        vit.forward(jnp.asarray(images), params, CFG,
                    compute_dtype=jnp.float32, kernels=kernels))


@pytest.fixture(scope="module")
def setup():
    images = fixtures.random_images(CFG, n=8, seed=2)
    calib = fixtures.random_images(CFG, n=16, seed=99)
    kernels = vit.resolve_kernels("xla", w8a8=True, heads=HEADS)
    return images, calib, kernels


def test_calibration_mirror_pins_forward(setup):
    """collect_act_stats mirrors the production forward math; its features
    output must match forward_features so the mirror cannot drift."""
    images, calib, _ = setup
    pn = _adversarial(1.0)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    stats = quant.collect_act_stats(calib, stacked, CFG)
    feats = np.asarray(vit.forward_features(
        jnp.asarray(calib), stacked, CFG, compute_dtype=jnp.float32))
    np.testing.assert_allclose(stats["features"], feats, atol=1e-4)
    d, h, L = CFG.embed_dim, CFG.hidden_dim, CFG.depth
    assert stats["qkv_in"].shape == (L, d)
    assert stats["out_in"].shape == (L, d)
    assert stats["fc1_in"].shape == (L, d)
    assert stats["fc2_in"].shape == (L, h)
    assert (stats["qkv_in"] > 0).all()


def test_outlier_plan_is_exact_in_fp32(setup):
    """The permutation plan is an equivalence transform: identical fp32
    probabilities (the residual-stream perm folds through LN because LN
    stats are permutation-invariant; the fc1->fc2 perm through elementwise
    GELU; the V perm stays within heads)."""
    images, calib, _ = setup
    pn = _adversarial(20.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    stats = quant.collect_act_stats(calib, stacked, CFG)
    plan = quant.plan_outliers(stats, CFG)
    permuted = quant.apply_outlier_plan(stacked, plan, CFG)
    probs = np.asarray(vit.forward(jnp.asarray(images), permuted, CFG,
                                   compute_dtype=jnp.float32))
    np.testing.assert_allclose(probs, ref, atol=2e-5)


def test_plan_shapes_and_split_weights(setup):
    images, calib, _ = setup
    stacked = vit.stack_params(_adversarial(1.0), CFG, param_dtype=jnp.float32)
    stats = quant.collect_act_stats(calib, stacked, CFG)
    plan = quant.plan_outliers(stats, CFG)
    d, h, L = CFG.embed_dim, CFG.hidden_dim, CFG.depth
    assert sorted(plan.perm_d.tolist()) == list(range(d))
    assert plan.perm_h.shape == (L, h)
    # within-head V permutation never crosses head boundaries
    hd = CFG.head_dim
    for head in range(CFG.num_heads):
        blk = plan.perm_v[:, head * hd:(head + 1) * hd]
        assert blk.min() >= head * hd and blk.max() < (head + 1) * hd
    qo = quant.quantize_stacked_params_outlier(
        quant.apply_outlier_plan(stacked, plan, CFG), CFG, plan)
    qkv = qo["layers"]["qkv_w"]
    assert qkv["q"].shape == (L, d - plan.k_d, 3 * d)
    assert qkv["hi"].shape == (L, plan.k_d, 3 * d)
    out_w = qo["layers"]["out_w"]
    assert out_w["q"].shape == (L, d, d)
    assert out_w["hi"].shape == (L, CFG.num_heads * plan.kh, d)
    # masked rows of the int8 block are exactly zero
    mask = quant._tail_mask(CFG, plan.kh)
    assert (out_w["q"][:, mask, :] == 0).all()
    fc2 = qo["layers"]["fc2_w"]
    assert fc2["q"].shape == (L, h - plan.k_h, d)


def test_adversarial_breaks_plain_w8a8_gate(setup):
    """Documents the hole: plain per-token absmax W8A8 on trained-ViT-like
    statistics violates the reference comparator gate (0.01) by >4x AND
    flips predicted labels."""
    images, _, kernels = setup
    pn = _adversarial(6.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    probs = _w8a8_probs(images, quant.quantize_stacked_params(stacked, CFG),
                        kernels)
    assert np.abs(probs - ref).max() > 0.02  # gate is 0.01
    pn_hi = _adversarial(20.0)
    ref_hi = golden.golden_forward(images, pn_hi, CFG)
    stacked_hi = vit.stack_params(pn_hi, CFG, param_dtype=jnp.float32)
    probs_hi = _w8a8_probs(
        images, quant.quantize_stacked_params(stacked_hi, CFG), kernels)
    assert not (probs_hi.argmax(-1) == ref_hi.argmax(-1)).all()


def test_outlier_w8a8_passes_gate(setup):
    """The outlier-aware mode passes the 0.01 comparator gate in the same
    regime where plain W8A8 fails it (measured: plain ~0.044, outlier
    ~0.009 at mean top-prob 0.18)."""
    images, calib, kernels = setup
    pn = _adversarial(6.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    qo = quant.calibrate_w8a8(calib, stacked, CFG)
    probs = _w8a8_probs(images, qo, kernels)
    assert np.abs(probs - ref).max() < 0.01


def test_outlier_w8a8_preserves_labels_when_confident(setup):
    """At high confidence (mean top-prob ~0.63) plain W8A8 mislabels;
    outlier-aware keeps every label exact and stays ~5x closer in prob."""
    images, calib, kernels = setup
    pn = _adversarial(20.0)
    ref = golden.golden_forward(images, pn, CFG)
    assert ref.max(-1).mean() > 0.5
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    plain = _w8a8_probs(images, quant.quantize_stacked_params(stacked, CFG),
                        kernels)
    qo = quant.calibrate_w8a8(calib, stacked, CFG)
    outlier = _w8a8_probs(images, qo, kernels)
    assert (outlier.argmax(-1) == ref.argmax(-1)).all()
    assert not (plain.argmax(-1) == ref.argmax(-1)).all()
    assert np.abs(outlier - ref).max() < 0.5 * np.abs(plain - ref).max()


def test_depth_compounding_outlier():
    """ViT-G-depth regime (narrow, deep): outlier-aware error must not
    compound past the confident-label bar."""
    cfg = ViTConfig(name="deep", img_size=32, patch_size=8, embed_dim=128,
                    depth=36, num_heads=4, num_classes=50)
    pn = fixtures.adversarial_params(cfg, seed=1)
    pn["heads_head_weight"] = pn["heads_head_weight"] * 20.0
    images = fixtures.random_images(cfg, n=4, seed=3)
    calib = fixtures.random_images(cfg, n=8, seed=77)
    ref = golden.golden_forward(images, pn, cfg)
    stacked = vit.stack_params(pn, cfg, param_dtype=jnp.float32)
    qo = quant.calibrate_w8a8(calib, stacked, cfg)
    kernels = vit.resolve_kernels("xla", w8a8=True,
                                  heads=(cfg.num_heads, cfg.head_dim))
    probs = np.asarray(vit.forward(jnp.asarray(images), qo, cfg,
                                   compute_dtype=jnp.float32, kernels=kernels))
    assert (probs.argmax(-1) == ref.argmax(-1)).all()
    assert np.abs(probs - ref).max() < 0.1


def test_engine_calibrate_end_to_end(setup):
    images, calib, _ = setup
    pn = _adversarial(6.0)
    ref = golden.golden_forward(images, pn, CFG)
    engine = InferenceEngine(
        CFG, pn, batch_size=4, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, quantize="int8-w8a8", calibrate=calib,
    )
    probs = engine.run(images)
    assert np.abs(probs - ref).max() < 0.01
    with pytest.raises(ValueError, match="calibrate"):
        InferenceEngine(CFG, pn, quantize=None, calibrate=calib)


def test_outlier_fused_layer_matches_per_op(setup):
    """Outlier-aware W8A8 through the fused-layer Pallas kernel (bf16 'hi'
    side-GEMMs + masked context quantization in VMEM) vs the per-op XLA
    path — same dicts, same quantization math. The kernel's tanh-form GELU
    (3.4e-6 vs exact erf) seeds int8 rounding flips downstream, so the
    cross-path bound is statistical, not bitwise; the binding assertion is
    that the FUSED path passes the same comparator gate vs the fp32 oracle
    that the per-op path does."""
    images, calib, kernels = setup
    pn = _adversarial(6.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    qo = quant.calibrate_w8a8(calib, stacked, CFG)
    per_op = _w8a8_probs(images, qo, kernels)
    fused = _w8a8_probs(
        images, qo, vit.resolve_kernels("flash", w8a8=True, heads=HEADS))
    assert np.abs(fused - ref).max() < 0.01  # comparator gate vs oracle
    np.testing.assert_allclose(fused, per_op, atol=5e-3)


def test_calibrate_w8a8_device_matches_host(setup):
    """calibrate_w8a8_device (the on-device permute+quantize used by
    bench.py for tunnel-bandwidth reasons) must produce the same pytree as
    the host-numpy path: identical int8 codes, matching scales and bf16 hi
    groups."""
    import jax

    _, calib, _ = setup
    pn = _adversarial(6.0)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    host = quant.calibrate_w8a8(calib, stacked, CFG)
    dev = jax.tree.map(np.asarray,
                       quant.calibrate_w8a8_device(jnp.asarray(calib),
                                                   stacked, CFG))
    for key in ("qkv_w", "out_w", "fc1_w", "fc2_w"):
        hw, dw = host["layers"][key], dev["layers"][key]
        assert dw["q"].dtype == np.int8 and dw["q"].shape == hw["q"].shape
        # np.rint and jnp.round both round half-to-even; codes match exactly.
        np.testing.assert_array_equal(dw["q"], hw["q"])
        np.testing.assert_allclose(np.asarray(dw["scale"], np.float32),
                                   np.asarray(hw["scale"], np.float32),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dw["hi"], np.float32),
                                   np.asarray(hw["hi"], np.float32),
                                   rtol=1e-2, atol=1e-6)  # bf16 grid
    np.testing.assert_allclose(np.asarray(dev["final_ln_w"]),
                               np.asarray(host["final_ln_w"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev["layers"]["qkv_b"]),
                                  np.asarray(host["layers"]["qkv_b"]))


def test_calibrate_w8a8_device_passes_gate(setup):
    """End to end: device-calibrated params through the W8A8 kernels pass
    the comparator gate in the adversarial regime (same bar as the host
    path)."""
    images, calib, kernels = setup
    pn = _adversarial(6.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    qo = quant.calibrate_w8a8_device(jnp.asarray(calib), stacked, CFG)
    probs = _w8a8_probs(images, qo, kernels)
    assert np.abs(probs - ref).max() < 0.01


def test_outlier_bf16_compute_fused_kernel_passes_gate(setup):
    """PRODUCTION configuration (VERDICT r4 #7): bf16 compute through the
    fused Pallas kernel with outlier-aware dicts must still pass the 0.01
    comparator gate vs the fp32 oracle — this is exactly the mode bench.py
    records as int8-w8a8-outlier."""
    images, calib, _ = setup
    pn = _adversarial(6.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    qo = quant.calibrate_w8a8(calib, stacked, CFG)
    kernels = vit.resolve_kernels("flash", w8a8=True, heads=HEADS)
    probs = np.asarray(
        vit.forward(jnp.asarray(images), qo, CFG,
                    compute_dtype=jnp.bfloat16, kernels=kernels))
    assert np.abs(probs - ref).max() < 0.01


def test_merge_act_stats(setup):
    images, calib, _ = setup
    stacked = vit.stack_params(_adversarial(1.0), CFG, param_dtype=jnp.float32)
    s1 = quant.collect_act_stats(calib[:8], stacked, CFG)
    s2 = quant.collect_act_stats(calib[8:], stacked, CFG)
    merged = quant.merge_act_stats(s1, s2)
    full = quant.collect_act_stats(calib, stacked, CFG)
    for k in ("qkv_in", "out_in", "fc1_in", "fc2_in"):
        np.testing.assert_allclose(merged[k], full[k], rtol=1e-6)


# ---------------------------------------------------------------------------
# SmoothQuant-style smoothing (kept as an exact, composable transform; the
# measured adversarial numbers showed it cannot rescue 30-100x outliers on
# its own — see the module docstring in models/quant.py)
# ---------------------------------------------------------------------------


def test_smoothing_is_exact_in_fp32(setup):
    images, calib, _ = setup
    pn = _adversarial(20.0)
    ref = golden.golden_forward(images, pn, CFG)
    stacked = vit.stack_params(pn, CFG, param_dtype=jnp.float32)
    sm = quant.smooth_for_w8a8(calib, stacked, CFG, alpha=0.5)
    probs = np.asarray(vit.forward(jnp.asarray(images), sm, CFG,
                                   compute_dtype=jnp.float32))
    np.testing.assert_allclose(probs, ref, atol=2e-5)


def test_smoothing_rejects_unsmoothable_site(setup):
    _, calib, _ = setup
    stacked = vit.stack_params(_adversarial(1.0), CFG, param_dtype=jnp.float32)
    stats = quant.collect_act_stats(calib, stacked, CFG)
    scales = quant.smoothing_scales(stats, stacked)
    with pytest.raises(ValueError, match="fc2"):
        quant.smooth_stacked_params(stacked, scales, sites=("qkv", "fc2"))
