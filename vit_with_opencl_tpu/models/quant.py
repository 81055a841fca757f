"""Weight-only int8 quantization (per-output-channel symmetric).

A serving capability beyond the reference (which is fp32-only): matmul
weights are stored as int8 with one fp32 scale per output channel, halving
weight HBM footprint and upload traffic versus bf16 (4x vs the reference's
fp32). Because the scale is per *output* channel it commutes out of the
matmul — the compute path stays on the bf16 MXU:

    y = (x @ dequant(Wq))        ==   (x @ Wq.astype(bf16)) * scale

so quantized inference reuses the same kernels with a fused scale epilogue;
no separate dequant pass, no int-domain activation quantization (accuracy
stays within ~1e-3 of bf16 on probabilities for ViT-scale models).

Layout notes: stacked weights are right-multiply ``[..., in, out]``; scales
are ``[..., 1, out]`` so ``lax.scan`` slicing works unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig

# Keys of matmul weights inside params["layers"] (right-multiply layout).
_LAYER_MATMUL_KEYS = ("qkv_w", "out_w", "fc1_w", "fc2_w")
# Top-level matmul weights.
_TOP_MATMUL_KEYS = ("patch_w", "head_w", "head_dist_w")


def quantize_weight(w: np.ndarray) -> Dict[str, np.ndarray]:
    """fp weight [..., in, out] → {"q": int8, "scale": f32 [..., 1, out]}."""
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale == 0.0, 1.0, scale)
    q = np.clip(np.rint(w / safe), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale}


def dequantize_weight(qw: Dict[str, np.ndarray]) -> np.ndarray:
    return np.asarray(qw["q"], np.float32) * np.asarray(qw["scale"], np.float32)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def quantize_stacked_params(params: Dict[str, Any], config: ViTConfig) -> Dict[str, Any]:
    """Quantize every matmul weight in a stacked param pytree (host-side).

    LN parameters, biases, embeddings stay fp32 (tiny, accuracy-critical).
    """
    out = dict(params)
    for key in _TOP_MATMUL_KEYS:
        if key in out:
            out[key] = quantize_weight(np.asarray(out[key], np.float32))
    layers = dict(params["layers"])
    for key in _LAYER_MATMUL_KEYS:
        layers[key] = quantize_weight(np.asarray(layers[key], np.float32))
    out["layers"] = layers
    return out


def quantize_weight_device(w: jax.Array) -> Dict[str, jax.Array]:
    """jnp twin of ``quantize_weight`` for on-device use (e.g. bench.py's
    synthetic weights, where a host round trip of ViT-sized tensors through
    the tunneled runtime costs minutes)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = absmax * jnp.float32(1 / 127)
    safe = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / safe), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def quantize_stacked_params_device(params: Dict[str, Any],
                                   config: ViTConfig) -> Dict[str, Any]:
    """Device-side (jit-able) twin of ``quantize_stacked_params``."""
    out = dict(params)
    for key in _TOP_MATMUL_KEYS:
        if key in out:
            out[key] = quantize_weight_device(out[key])
    layers = dict(params["layers"])
    for key in _LAYER_MATMUL_KEYS:
        layers[key] = quantize_weight_device(layers[key])
    out["layers"] = layers
    return out


def quantize_act(x: jax.Array):
    """Dynamic per-token symmetric activation quantization.

    x [..., D] (any float dtype) → (int8 [..., D], fp32 scale [..., 1]) with
    scale = rowwise absmax / 127. Exact zero rows get a 2^-93 floor (any
    nonzero value works — the quantized row is all zeros either way) so the
    divide never produces NaN.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                         jnp.float32(2.0 ** -93))
    # One divide per row, then multiplies: VPU divides are multi-op. No
    # clip needed: |xf| <= absmax elementwise, so |xf*r| <= 127*(1+2^-23)
    # < 127.5 and round-to-nearest can never produce 128.
    r = jnp.float32(127.0) / absmax
    q = jnp.round(xf * r).astype(jnp.int8)
    return q, absmax * jnp.float32(1 / 127)


def matmul_w8a8(x: jax.Array, w: Any, b: Any, heads=None) -> jax.Array:
    """W8A8 dynamic matmul: int8 activations × int8 weights on the MXU.

    The v5e MXU runs int8×int8→int32 at 2× the bf16 rate (measured 1.79×
    chained on this chip, scripts/probe_int8.py) — weight-only int8 gets
    none of that because it casts to bf16 on the way in. Here the activation
    is quantized per token at runtime (absmax symmetric), the GEMM runs in
    the int domain with int32 accumulation, and the two scales come back as
    one fp32 epilogue:

        y = (x_q @ w_q) · s_x ⊗ s_w   (+ b)

    Weights must already be int8 dicts (quantize_stacked_params); fp weights
    fall back to the bf16 path — W8A8 with fp weights would quantize weights
    per call, paying the conversion every step.

    Outlier-aware dicts (quantize_stacked_params_outlier) carry a bf16
    ``hi`` block of calibrated outlier-channel rows: a trailing contiguous
    group (q rows < input channels) runs as int8-GEMM + small bf16 GEMM;
    a masked per-head-tail group (q rows == input channels, zeros on the
    tails) additionally excludes the tails from the per-token absmax and
    needs ``heads=(num_heads, head_dim)`` to slice them structurally.
    """
    if not is_quantized(w):
        return matmul_q(x, w, b)
    if w["q"].ndim != 2:
        raise ValueError(
            f"matmul_w8a8 expects a single layer's 2D weight, got q shape "
            f"{w['q'].shape}"
        )
    dn = (((x.ndim - 1,), (0,)), ((), ()))
    din = x.shape[-1]
    m = w["q"].shape[0]
    if "hi" not in w:
        xq, sx = quantize_act(x)
        acc = jax.lax.dot_general(xq, w["q"], dn,
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * sx * w["scale"][..., 0, :]
    elif m < din:
        # Trailing contiguous outlier group in bf16 (qkv/fc1/fc2 inputs).
        xq, sx = quantize_act(x[..., :m])
        acc = jax.lax.dot_general(xq, w["q"], dn,
                                  preferred_element_type=jnp.int32)
        hi = jnp.dot(x[..., m:], w["hi"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
        out = acc.astype(jnp.float32) * sx * w["scale"][..., 0, :] + hi
    else:
        # Masked per-head-tail outlier group (attention-context input):
        # tails are zero rows in q AND excluded from the absmax, so the
        # int8 side is exact for the normal channels; the tails run bf16.
        if heads is None:
            raise ValueError(
                "outlier W8A8 on the attention context needs "
                "heads=(num_heads, head_dim)")
        nh, hd = heads
        kh = w["hi"].shape[0] // nh
        mask = np.zeros(din, bool)
        for h in range(nh):
            mask[h * hd + hd - kh:(h + 1) * hd] = True
        keep = jnp.asarray(~mask, jnp.float32)
        xf = x.astype(jnp.float32)
        absmax = jnp.maximum(jnp.max(jnp.abs(xf) * keep, axis=-1,
                                     keepdims=True), jnp.float32(2.0 ** -93))
        r = jnp.float32(127.0) / absmax
        # tails can exceed the kept absmax: clip before the int8 cast (their
        # weight rows are zero, the clipped values never reach the output)
        xq = jnp.clip(jnp.round(xf * r), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w["q"], dn,
                                  preferred_element_type=jnp.int32)
        x3 = x.reshape(x.shape[:-1] + (nh, hd))
        x_hi = x3[..., hd - kh:].reshape(x.shape[:-1] + (nh * kh,))
        hi = jnp.dot(x_hi, w["hi"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
        out = (acc.astype(jnp.float32) * (absmax * jnp.float32(1 / 127))
               * w["scale"][..., 0, :] + hi)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# SmoothQuant-style offline smoothing (outlier-robust W8A8)
# ---------------------------------------------------------------------------
#
# Trained ViTs carry activation outlier CHANNELS (LN-gain-amplified residual
# stream channels — the pattern SmoothQuant, arXiv:2211.10438, targets in
# LLMs). Per-token absmax activation quantization is exactly wrong for them:
# one hot channel inflates every token's scale, crushing all other channels
# to a handful of int8 levels. The fix is an OFFLINE equivalence transform
# that migrates per-channel activation scale into the producing weights:
#
#     y = (x / s) @ (diag(s) @ W)
#
# where s_j = a_j^alpha / w_j^(1-alpha) (a_j = calibrated activation absmax,
# w_j = weight per-input-channel absmax). The division by s folds into the
# per-channel affine that PRODUCES x, so runtime cost is ZERO:
#
#   * qkv input  = LN1 output  → fold 1/s into ln1_w, ln1_b
#   * fc1 input  = LN2 output  → fold 1/s into ln2_w, ln2_b
#   * out_proj input = attention context: channel j of the context is a
#     convex combination (softmax weights) of V channel j across tokens, so
#     scaling the V slice of qkv_w/qkv_b by 1/s scales the context by 1/s
#     exactly → fold 1/s into qkv_w[:, :, 2D:3D], qkv_b[:, 2D:3D]
#   * fc2 input = GELU output: gelu(x/s) != gelu(x)/s, so there is NO exact
#     zero-cost fold — fc2 is deliberately not smoothed (measured: the LN/V
#     sites are where trained-ViT outliers live; see tests/test_smoothquant).
#
# The transform happens on host fp32 params BEFORE quantize_stacked_params;
# every downstream consumer (per-op XLA W8A8, the fused-layer Pallas kernel,
# TP/SP shardings) is untouched.


# W8A8 GEMM input sites that admit an exact zero-runtime-cost fold.
SMOOTH_SITES = ("qkv", "out", "fc1")


def collect_act_stats(
    images,
    params: Dict[str, Any],
    config: ViTConfig,
    *,
    compute_dtype=jnp.float32,
) -> Dict[str, np.ndarray]:
    """Calibration pass: per-layer per-channel absmax at the four W8A8 GEMM
    inputs, as ONE jitted program (a single dispatch — eager per-layer loops
    are pathological on tunneled runtimes).

    Mirrors ``vit._attention_block``/``vit._mlp_block`` math exactly (fp32
    LN stats, erf GELU, fp32-accumulated matmuls); the returned ``features``
    key lets tests pin this mirror against ``vit.forward_features`` so the
    two cannot drift silently.

    Returns {"qkv_in": [L, D], "out_in": [L, D], "fc1_in": [L, D],
    "fc2_in": [L, H], "features": [B, T, D]} (host numpy, fp32).
    """
    from . import vit

    nh, hd = config.num_heads, config.head_dim

    @jax.jit
    def run(images, params):
        x = vit.embed(images, params, config, compute_dtype)
        if config.pre_norm:
            x = vit.layer_norm(x, params["pre_ln_w"], params["pre_ln_b"],
                               config.eps)
        b, t, d = x.shape

        def chmax(a):
            return jnp.max(jnp.abs(a.astype(jnp.float32)), axis=(0, 1))

        def block(h, lp):
            a1 = vit.layer_norm(h, lp["ln1_w"], lp["ln1_b"], config.eps)
            qkv = matmul_q(a1, lp["qkv_w"], lp["qkv_b"])
            qkv_r = qkv.reshape(b, t, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            ctx = vit.xla_attention(qkv_r[0], qkv_r[1], qkv_r[2], config)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
            h = h + matmul_q(ctx, lp["out_w"], lp["out_b"])
            a2 = vit.layer_norm(h, lp["ln2_w"], lp["ln2_b"], config.eps)
            hid = vit._gelu(matmul_q(a2, lp["fc1_w"], lp["fc1_b"]), config)
            h = h + matmul_q(hid, lp["fc2_w"], lp["fc2_b"])
            return h, (chmax(a1), chmax(ctx), chmax(a2), chmax(hid))

        x, (qkv_in, out_in, fc1_in, fc2_in) = jax.lax.scan(
            block, x, params["layers"])
        feats = vit.layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                               config.eps)
        return {"qkv_in": qkv_in, "out_in": out_in, "fc1_in": fc1_in,
                "fc2_in": fc2_in, "features": feats.astype(jnp.float32)}

    out = run(jnp.asarray(np.asarray(images, np.float32)), params)
    return {k: np.asarray(v) for k, v in out.items()}


def merge_act_stats(a: Dict[str, np.ndarray],
                    b: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Elementwise max of two calibration passes (multi-batch calibration)."""
    return {k: np.maximum(a[k], b[k]) for k in a if k != "features"}


def smoothing_scales(
    stats: Dict[str, np.ndarray],
    params: Dict[str, Any],
    alpha: float = 0.5,
) -> Dict[str, np.ndarray]:
    """Per-site smoothing factors s_j = a_j^alpha / w_j^(1-alpha).

    a_j: calibrated activation absmax (collect_act_stats); w_j: weight
    absmax over the consuming matmul's input channel j. Clamped to
    [1e-2, 1e4] so dead channels can't zero an LN gain or blow a weight row
    up. alpha=0.5 splits the quantization difficulty evenly between the
    activation and the (per-output-channel-scaled) weight.
    """
    lp = params["layers"]
    d = np.asarray(lp["out_w"]).shape[1]

    def w_absmax(w):  # [L, in, out] → per-input-channel absmax [L, in]
        return np.max(np.abs(np.asarray(w, np.float32)), axis=-1)

    def s_for(a, w):
        a = np.maximum(np.asarray(a, np.float32), 1e-5)
        w = np.maximum(w, 1e-5)
        s = a ** alpha / w ** (1.0 - alpha)
        return np.clip(s, 1e-2, 1e4).astype(np.float32)

    return {
        "qkv": s_for(stats["qkv_in"], w_absmax(lp["qkv_w"])),
        "out": s_for(stats["out_in"], w_absmax(lp["out_w"])),
        "fc1": s_for(stats["fc1_in"], w_absmax(lp["fc1_w"])),
    }


def smooth_stacked_params(
    params: Dict[str, Any],
    scales: Dict[str, np.ndarray],
    sites=SMOOTH_SITES,
) -> Dict[str, Any]:
    """Apply the smoothing equivalence transform (host-side, fp32 exact).

    Pure weight preprocessing: the returned pytree computes the SAME fp32
    function as the input (up to 1-ulp rounding on the folded affines) but
    its W8A8 quantization error on outlier-channel activations collapses.
    Call BEFORE quantize_stacked_params.
    """
    unknown = set(sites) - set(SMOOTH_SITES)
    if unknown:
        raise ValueError(
            f"unsmoothable sites {sorted(unknown)}: only {SMOOTH_SITES} admit "
            f"an exact zero-cost fold (fc2's GELU input does not)")
    out = dict(params)
    lp = {k: np.asarray(v, np.float32) if k in (
        "ln1_w", "ln1_b", "ln2_w", "ln2_b", "qkv_w", "qkv_b", "out_w",
        "fc1_w") else v for k, v in params["layers"].items()}
    d = lp["out_w"].shape[1]
    if "qkv" in sites:
        s = scales["qkv"]  # [L, D]
        lp["ln1_w"] = lp["ln1_w"] / s
        lp["ln1_b"] = lp["ln1_b"] / s
        lp["qkv_w"] = lp["qkv_w"] * s[:, :, None]
    if "out" in sites:
        s = scales["out"]  # [L, D]
        qkv_w = np.array(lp["qkv_w"])
        qkv_w[:, :, 2 * d:] = qkv_w[:, :, 2 * d:] / s[:, None, :]
        lp["qkv_w"] = qkv_w
        qkv_b = np.array(lp["qkv_b"])
        qkv_b[:, 2 * d:] = qkv_b[:, 2 * d:] / s
        lp["qkv_b"] = qkv_b
        lp["out_w"] = lp["out_w"] * s[:, :, None]
    if "fc1" in sites:
        s = scales["fc1"]  # [L, D]
        lp["ln2_w"] = lp["ln2_w"] / s
        lp["ln2_b"] = lp["ln2_b"] / s
        lp["fc1_w"] = lp["fc1_w"] * s[:, :, None]
    out["layers"] = lp
    return out


def smooth_for_w8a8(
    images,
    params: Dict[str, Any],
    config: ViTConfig,
    alpha: float = 0.5,
) -> Dict[str, Any]:
    """Calibrate on ``images`` and smooth: the one-call engine entry point."""
    stats = collect_act_stats(images, params, config)
    return smooth_stacked_params(params, smoothing_scales(stats, params, alpha))


# ---------------------------------------------------------------------------
# Outlier-aware W8A8 (the flagship accuracy mode)
# ---------------------------------------------------------------------------
#
# Measured on adversarial trained-ViT-statistics fixtures
# (harness.fixtures.adversarial_params), smoothing alone cannot rescue
# per-token absmax quantization: with 30-100x outlier channels, any alpha
# either leaves the activation scale polluted or pushes the pollution into
# the per-output-channel weight scales (tests/test_quant_outlier.py records
# the numbers). The scheme that reaches the int8 noise floor is
# mixed-precision by CHANNEL with static identities (LLM.int8()'s insight,
# arXiv:2208.07339, made TPU-shaped):
#
#   1. Calibrate per-channel absmax at the four encoder GEMM inputs
#      (collect_act_stats).
#   2. PERMUTE channels so the hottest land in one tile-aligned trailing
#      group. Permutations are exact equivalence transforms here:
#        - the residual stream admits ONE global permutation folded into
#          every producer/consumer (LN stats are permutation-invariant);
#        - fc1->fc2 admits a per-layer permutation (GELU is elementwise);
#        - V channels admit per-layer WITHIN-HEAD permutations (attention
#          mixes tokens, never channels across heads).
#   3. Quantize the normal group per token (absmax dynamic int8, MXU
#      double-rate) and keep the outlier group in bf16 — a second small MXU
#      GEMM on a [*, k] tile, zero quantization error for exactly the
#      channels absmax cannot represent.
#
# At D=768 with k=128 the split is 640+128 — both MXU-tile-exact, so the
# int8 GEMM shrinks by the same FLOPs the bf16 GEMM adds. Everything is
# offline weight preprocessing except the extra small dot per GEMM.

from dataclasses import dataclass


@dataclass(frozen=True)
class OutlierPlan:
    """Channel permutations + group widths for outlier-aware W8A8.

    ``perm_d``: [D] global residual-stream permutation (hot channels last).
    ``perm_h``: [L, H] per-layer fc1-output permutation (hot last).
    ``perm_v``: [L, D] per-layer within-head V permutation (hot at each
    head's tail).
    ``k_d``: trailing bf16 group width for the qkv/fc1 GEMM inputs.
    ``k_h``: trailing bf16 group width for the fc2 GEMM input.
    ``kh``: per-head bf16 tail width for the out-proj GEMM input (the
    context outlier group is the union of per-head tails — head membership
    of V channels cannot change, so this group is strided, handled by a
    masked int8 GEMM + a per-head tail slice).
    """

    perm_d: np.ndarray
    perm_h: np.ndarray
    perm_v: np.ndarray
    k_d: int
    k_h: int
    kh: int


def _group_width(c: int) -> int:
    """Default trailing-group width: one 128 lane-tile when the dimension
    affords it (zero extra MXU padding), else an eighth (tiny test configs)."""
    return 128 if c >= 512 else max(4, c // 8)


def plan_outliers(
    stats: Dict[str, np.ndarray],
    config: ViTConfig,
    *,
    k_d: Optional[int] = None,
    k_h: Optional[int] = None,
    kh: Optional[int] = None,
) -> OutlierPlan:
    """Build the permutation plan from calibration stats (hot channels last).

    The residual-stream permutation pools the qkv and fc1 input stats over
    layers (outlier channel identities are persistent in trained nets; the
    pool is median-normalized per layer so one hot layer can't drown the
    rest).
    """
    d, h, nhd = config.embed_dim, config.hidden_dim, config.head_dim
    nh = config.num_heads
    k_d = _group_width(d) if k_d is None else int(k_d)
    k_h = _group_width(h) if k_h is None else int(k_h)
    kh = max(2, nhd // 8) if kh is None else int(kh)
    if not (0 < k_d < d and 0 < k_h < h and 0 < kh < nhd):
        raise ValueError(f"bad outlier group widths k_d={k_d} k_h={k_h} kh={kh}")

    def norm(a):  # [L, C] -> per-layer median-normalized
        return a / np.maximum(np.median(a, axis=-1, keepdims=True), 1e-12)

    pool = np.maximum(norm(stats["qkv_in"]).max(0), norm(stats["fc1_in"]).max(0))
    perm_d = np.argsort(pool, kind="stable")
    perm_h = np.argsort(stats["fc2_in"], axis=-1, kind="stable")
    L = stats["out_in"].shape[0]
    perm_v = np.zeros((L, d), np.int64)
    for layer in range(L):
        per_head = stats["out_in"][layer].reshape(nh, nhd)
        for head in range(nh):
            perm_v[layer, head * nhd:(head + 1) * nhd] = (
                head * nhd + np.argsort(per_head[head], kind="stable"))
    return OutlierPlan(perm_d=perm_d, perm_h=perm_h, perm_v=perm_v,
                       k_d=k_d, k_h=k_h, kh=kh)


def apply_outlier_plan(params: Dict[str, Any], plan: OutlierPlan,
                       config: ViTConfig) -> Dict[str, Any]:
    """Fold the plan's permutations into the fp params (host fp32, exact).

    The returned pytree computes the identical function; only the channel
    ORDER of internal bases changes. Apply BEFORE quantize_stacked_params
    (which then splits the trailing groups out as bf16). Keep the original
    named params for export — this transform is for the serving copy.
    """
    P, Ph, Pv = plan.perm_d, plan.perm_h, plan.perm_v
    d = config.embed_dim
    L = config.depth

    def f32(a):
        return np.asarray(a, np.float32)

    out = dict(params)
    out["patch_w"] = f32(params["patch_w"])[:, P]
    out["patch_b"] = f32(params["patch_b"])[P]
    out["pos_emb"] = f32(params["pos_emb"])[:, P]
    out["prefix_tokens"] = f32(params["prefix_tokens"])[:, P]
    out["final_ln_w"] = f32(params["final_ln_w"])[P]
    out["final_ln_b"] = f32(params["final_ln_b"])[P]
    if "pre_ln_w" in params:
        out["pre_ln_w"] = f32(params["pre_ln_w"])[P]
        out["pre_ln_b"] = f32(params["pre_ln_b"])[P]
    if "head_w" in params:
        out["head_w"] = f32(params["head_w"])[P, :]
    if "head_dist_w" in params:
        out["head_dist_w"] = f32(params["head_dist_w"])[P, :]

    lp = {k: f32(v) for k, v in params["layers"].items()}
    for key in ("ln1_w", "ln1_b", "ln2_w", "ln2_b", "out_b", "fc2_b"):
        lp[key] = lp[key][:, P]
    lp["qkv_w"] = lp["qkv_w"][:, P, :]
    lp["fc1_w"] = lp["fc1_w"][:, P, :]
    lp["out_w"] = lp["out_w"][:, :, P]
    lp["fc2_w"] = lp["fc2_w"][:, :, P]
    # per-layer fc1->fc2 permutation (GELU is elementwise: exact)
    lp["fc1_w"] = np.take_along_axis(lp["fc1_w"], Ph[:, None, :], axis=2)
    lp["fc1_b"] = np.take_along_axis(lp["fc1_b"], Ph, axis=1)
    lp["fc2_w"] = np.stack([lp["fc2_w"][layer][Ph[layer], :]
                            for layer in range(L)])
    # per-layer within-head V permutation (attention never mixes channels)
    vcols = lp["qkv_w"][:, :, 2 * d:]
    lp["qkv_w"] = np.concatenate(
        [lp["qkv_w"][:, :, :2 * d],
         np.take_along_axis(vcols, Pv[:, None, :], axis=2)], axis=2)
    lp["qkv_b"] = np.concatenate(
        [lp["qkv_b"][:, :2 * d],
         np.take_along_axis(lp["qkv_b"][:, 2 * d:], Pv, axis=1)], axis=1)
    lp["out_w"] = np.stack([lp["out_w"][layer][Pv[layer], :]
                            for layer in range(L)])
    out["layers"] = lp
    return out


def _tail_mask(config: ViTConfig, kh: int) -> np.ndarray:
    """bool [D]: True on each head's trailing ``kh`` context channels."""
    nh, hd = config.num_heads, config.head_dim
    m = np.zeros(nh * hd, bool)
    for head in range(nh):
        m[head * hd + hd - kh:(head + 1) * hd] = True
    return m


def _split_weight(w: np.ndarray, k: int) -> Dict[str, np.ndarray]:
    """[..., in, out] fp -> int8 dict for rows [:-k] + bf16 "hi" rows [-k:]."""
    import ml_dtypes

    w = np.asarray(w, np.float32)
    lo = quantize_weight(w[..., :-k, :] if k else w)
    lo["hi"] = np.ascontiguousarray(w[..., w.shape[-2] - k:, :]).astype(
        ml_dtypes.bfloat16)
    return lo


def _masked_weight(w: np.ndarray, mask: np.ndarray) -> Dict[str, np.ndarray]:
    """[..., D, out] fp -> int8 dict with masked rows zeroed + bf16 "hi"
    holding exactly the masked rows (per-head tail order)."""
    import ml_dtypes

    w = np.asarray(w, np.float32)
    w_lo = np.array(w)
    w_lo[..., mask, :] = 0.0
    out = quantize_weight(w_lo)
    out["hi"] = np.ascontiguousarray(w[..., mask, :]).astype(ml_dtypes.bfloat16)
    return out


def quantize_stacked_params_outlier(
    params: Dict[str, Any], config: ViTConfig, plan: OutlierPlan
) -> Dict[str, Any]:
    """Quantize plan-permuted params with bf16 outlier groups split out.

    qkv/fc1 keep their trailing ``k_d`` input rows in bf16; fc2 its trailing
    ``k_h``; out-proj holds its per-head tails (``kh`` per head) as "hi"
    with the matching int8 rows zeroed. Embed/head quantize weight-only as
    in :func:`quantize_stacked_params`.
    """
    out = dict(params)
    for key in _TOP_MATMUL_KEYS:
        if key in out:
            out[key] = quantize_weight(np.asarray(out[key], np.float32))
    layers = dict(params["layers"])
    layers["qkv_w"] = _split_weight(layers["qkv_w"], plan.k_d)
    layers["fc1_w"] = _split_weight(layers["fc1_w"], plan.k_d)
    layers["fc2_w"] = _split_weight(layers["fc2_w"], plan.k_h)
    layers["out_w"] = _masked_weight(layers["out_w"], _tail_mask(config, plan.kh))
    out["layers"] = layers
    return out


def calibrate_w8a8(
    images,
    params: Dict[str, Any],
    config: ViTConfig,
    **plan_kw,
) -> Dict[str, Any]:
    """One-call outlier-aware quantization: calibrate -> plan -> permute ->
    quantize. ``params`` are fp stacked params (device or host); the result
    is a host pytree ready for ``jax.device_put``."""
    stats = collect_act_stats(images, params, config)
    plan = plan_outliers(stats, config, **plan_kw)
    permuted = apply_outlier_plan(params, plan, config)
    return quantize_stacked_params_outlier(permuted, config, plan)


# --- device-side (jit) twins of the outlier transform -----------------------
#
# ``apply_outlier_plan``/``quantize_stacked_params_outlier`` are host-numpy:
# fine for real checkpoints (already on host), ruinous for device-resident
# params on a tunneled runtime (a ViT-G pytree is ~7 GB; fetching it to host
# to permute it would take minutes at tunnel bandwidth). These twins run the
# whole permute+quantize as ONE jit program on device; only the tiny
# calibration stats ([L, D]-sized) ever cross to host, to build the plan.


def apply_outlier_plan_device(params: Dict[str, Any], plan: OutlierPlan,
                              config: ViTConfig) -> Dict[str, Any]:
    """jnp twin of :func:`apply_outlier_plan` (call under jit).

    Permutation indices are static numpy (int32 — a few KB to low MB even at
    ViT-G scale, safe to bake into the program as constants)."""
    P = np.asarray(plan.perm_d, np.int32)
    Ph = np.asarray(plan.perm_h, np.int32)
    Pv = np.asarray(plan.perm_v, np.int32)

    def f32(a):
        return a.astype(jnp.float32)

    out = dict(params)
    out["patch_w"] = params["patch_w"][:, P]
    out["patch_b"] = f32(params["patch_b"])[P]
    out["pos_emb"] = f32(params["pos_emb"])[:, P]
    out["prefix_tokens"] = f32(params["prefix_tokens"])[:, P]
    out["final_ln_w"] = f32(params["final_ln_w"])[P]
    out["final_ln_b"] = f32(params["final_ln_b"])[P]
    if "pre_ln_w" in params:
        out["pre_ln_w"] = f32(params["pre_ln_w"])[P]
        out["pre_ln_b"] = f32(params["pre_ln_b"])[P]
    if "head_w" in params:
        out["head_w"] = params["head_w"][P, :]
    if "head_dist_w" in params:
        out["head_dist_w"] = params["head_dist_w"][P, :]

    d = config.embed_dim
    lp = dict(params["layers"])
    for key in ("ln1_w", "ln1_b", "ln2_w", "ln2_b", "out_b", "fc2_b"):
        lp[key] = f32(lp[key])[:, P]
    # Big weights permute in their stored dtype (gathers are exact; the
    # quantizer casts per-tensor later) — halves transient HBM at ViT-G scale.
    lp["qkv_w"] = lp["qkv_w"][:, P, :]
    lp["fc1_w"] = lp["fc1_w"][:, P, :]
    lp["out_w"] = lp["out_w"][:, :, P]
    lp["fc2_w"] = lp["fc2_w"][:, :, P]
    lp["fc1_w"] = jnp.take_along_axis(lp["fc1_w"], Ph[:, None, :], axis=2)
    lp["fc1_b"] = jnp.take_along_axis(f32(lp["fc1_b"]), Ph, axis=1)
    lp["fc2_w"] = jnp.take_along_axis(lp["fc2_w"], Ph[:, :, None], axis=1)
    vcols = jnp.take_along_axis(lp["qkv_w"][:, :, 2 * d:], Pv[:, None, :],
                                axis=2)
    lp["qkv_w"] = jnp.concatenate([lp["qkv_w"][:, :, :2 * d], vcols], axis=2)
    qkv_b = f32(lp["qkv_b"])
    lp["qkv_b"] = jnp.concatenate(
        [qkv_b[:, :2 * d], jnp.take_along_axis(qkv_b[:, 2 * d:], Pv, axis=1)],
        axis=1)
    lp["out_w"] = jnp.take_along_axis(lp["out_w"], Pv[:, :, None], axis=1)
    out["layers"] = lp
    return out


def _split_weight_device(w: jax.Array, k: int) -> Dict[str, jax.Array]:
    wf = w.astype(jnp.float32)
    lo = quantize_weight_device(wf[..., :-k, :] if k else wf)
    lo["hi"] = wf[..., wf.shape[-2] - k:, :].astype(jnp.bfloat16)
    return lo


def _masked_weight_device(w: jax.Array, mask: np.ndarray) -> Dict[str, jax.Array]:
    wf = w.astype(jnp.float32)
    keep = jnp.asarray(~mask, jnp.float32)[:, None]
    out = quantize_weight_device(wf * keep)
    out["hi"] = wf[..., np.where(mask)[0], :].astype(jnp.bfloat16)
    return out


def quantize_stacked_params_outlier_device(
    params: Dict[str, Any], config: ViTConfig, plan: OutlierPlan
) -> Dict[str, Any]:
    """jnp twin of :func:`quantize_stacked_params_outlier` (call under jit)."""
    out = dict(params)
    for key in _TOP_MATMUL_KEYS:
        if key in out:
            out[key] = quantize_weight_device(out[key])
    layers = dict(params["layers"])
    layers["qkv_w"] = _split_weight_device(layers["qkv_w"], plan.k_d)
    layers["fc1_w"] = _split_weight_device(layers["fc1_w"], plan.k_d)
    layers["fc2_w"] = _split_weight_device(layers["fc2_w"], plan.k_h)
    layers["out_w"] = _masked_weight_device(
        layers["out_w"], _tail_mask(config, plan.kh))
    out["layers"] = layers
    return out


def calibrate_w8a8_device(
    images,
    params: Dict[str, Any],
    config: ViTConfig,
    **plan_kw,
) -> Dict[str, Any]:
    """Device-resident twin of :func:`calibrate_w8a8`: the calibration
    forward and the permute+quantize both run on device; only the [L, D]-
    sized stats come to host (to argsort the plan). Returns a device pytree
    in the same layout :func:`quantize_stacked_params_outlier` produces."""
    stats = collect_act_stats(images, params, config)
    plan = plan_outliers(stats, config, **plan_kw)
    fn = jax.jit(lambda p: quantize_stacked_params_outlier_device(
        apply_outlier_plan_device(p, plan, config), config, plan))
    return fn(params)


def matmul_q(x: jax.Array, w: Any, b: Any, compute_dtype=None) -> jax.Array:
    """Quantization-aware matmul: transparently handles fp and int8 weights.

    For int8: cast to the activation dtype (int8 values are exact in bf16),
    MXU matmul with fp32 accumulation, then the per-channel scale as an fp32
    epilogue — fused by XLA.
    """
    if is_quantized(w):
        if w["q"].ndim != 2:
            # A full stacked weight ({q: [L, in, out]}) would broadcast layer
            # 0's scale over every layer — wrong numerics with no shape error.
            # Callers must pass one lax.scan-sliced layer at a time.
            raise ValueError(
                f"matmul_q expects a single layer's 2D weight, got q shape "
                f"{w['q'].shape}"
            )
        wq = w["q"].astype(x.dtype)
        out = jnp.dot(x, wq, preferred_element_type=jnp.float32)
        out = out * w["scale"][..., 0, :]
    else:
        out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)
