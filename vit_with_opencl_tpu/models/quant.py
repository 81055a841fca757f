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

from typing import Any, Dict

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


def matmul_w8a8(x: jax.Array, w: Any, b: Any) -> jax.Array:
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
    """
    if not is_quantized(w):
        return matmul_q(x, w, b)
    if w["q"].ndim != 2:
        raise ValueError(
            f"matmul_w8a8 expects a single layer's 2D weight, got q shape "
            f"{w['q'].shape}"
        )
    xq, sx = quantize_act(x)
    acc = jax.lax.dot_general(
        xq, w["q"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * w["scale"][..., 0, :]
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


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
