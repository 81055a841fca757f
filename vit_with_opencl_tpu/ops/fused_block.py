"""Whole-encoder-layer fused kernel for small models.

For small embedding dims (ViT-Tiny: D=192) the per-op pipeline is dominated
by HBM round trips between tiny GEMMs — LN, residuals and activations each
cost a full pass over the activations while the matmuls barely load the MXU.
This kernel runs one COMPLETE pre-LN encoder layer per grid cell with every
weight VMEM-resident (constant index maps keep them loaded across the batch
grid): LN1 → QKV → per-head attention → out-proj → residual → LN2 → fc1 →
erf-GELU → fc2 → residual, with activations never leaving VMEM.

Measured on v5e, whole-layer fusion beats the per-op XLA path at EVERY model
size whose per-layer weights fit VMEM — +36% at D=384 down to +12.5% at
D=768 (see FUSED_BLOCK_MAX_WEIGHT_BYTES) — because it removes the LN/
residual/GELU HBM round trips between GEMMs. The layer loop stays an XLA
``lax.scan`` — each step is one fused kernel launch. Models whose COMPLETE
stack fits VMEM additionally use the whole-encoder variant below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ViTConfig
from . import attention


# Minimax-fitted odd polynomial inside tanh: GELU(x) = 0.5x(1+tanh(x P(x^2))).
# tanh absorbs the CDF saturation, so 5 coefficients reach |err| <= 3.4e-6 on
# all of R (strictly positive P keeps the tails exact); fit in
# scripts (least-squares + minimax reweighting vs scipy erf).
_GELU_P = (0.79782813653302, 0.03646878821593782, -0.00012485972711897262,
           -3.0581402420578764e-05, 1.1191059256776888e-06)


def _gelu_fast(x):
    """erf-GELU to 3.4e-6 in ~10 VPU ops: one tanh, no exp/divide/abs/select.

    The A&S erf route (_erf_approx) costs an exp + reciprocal + sign/abs per
    element; on VPU-bound small models the GELU composite was measured at 23%
    of total runtime (scripts/probe_tiny_bound.py). This form halves that.
    """
    u = x * x
    p = jnp.float32(_GELU_P[4])
    for c in _GELU_P[3::-1]:
        p = p * u + jnp.float32(c)
    return 0.5 * x * (1.0 + jnp.tanh(x * p))


def _gelu_fast_grad(x):
    """Derivative of ``_gelu_fast`` (NOT of exact erf-GELU: the backward must
    differentiate the function the forward actually computed, or gradient
    checks against the fused forward drift by the approximation error).

    g(x) = 0.5 x (1 + tanh(w)), w = x P(x^2)
    g'(x) = 0.5 (1 + t) + 0.5 x (1 - t^2) (P(u) + 2 u P'(u)),  t = tanh(w)
    """
    u = x * x
    p = jnp.float32(_GELU_P[4])
    for c in _GELU_P[3::-1]:
        p = p * u + jnp.float32(c)
    dp = 4.0 * jnp.float32(_GELU_P[4])
    for i, c in zip((3.0, 2.0, 1.0), _GELU_P[3:0:-1]):
        dp = dp * u + i * jnp.float32(c)
    t = jnp.tanh(x * p)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * (p + 2.0 * u * dp)


def _whole(shape):
    """BlockSpec for a whole (grid-constant) operand — weights stay resident
    across the batch grid via the constant index map."""
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda i, _z=zeros: _z)


def _quantize_rows(hf):
    """Per-row absmax int8 quantization: [M, D] fp32 → (int8 [M, D],
    fp32 scale [M, 1]). ONE implementation lives in models/quant.quantize_act
    (reciprocal-multiply, no-clip proof there); this delegates through the
    module attribute so the attribution probe's substitution of
    ``quant.quantize_act`` covers the in-kernel path too."""
    from ..models import quant

    return quant.quantize_act(hf)


def _mm(h, w_ref, l, s_ref, w8a8=False, hi_ref=None, cdt=None):
    """Matmul against layer ``l`` of a resident weight ref; int8 weights are
    cast into the MXU dtype and the per-output-channel fp32 scale (if any)
    is applied to the accumulator (models/quant.matmul_q semantics).

    ``w8a8``: quantize ``h`` per token (absmax symmetric) and run the GEMM
    int8×int8→int32 — the MXU's double-rate int path (models/quant.
    matmul_w8a8 semantics; measured 1.79× bf16, scripts/probe_int8.py).
    The token scale joins the weight's channel scale in the fp32 epilogue.

    ``hi_ref``: outlier-aware split (models/quant.matmul_w8a8 semantics):
    the int8 ref covers the leading input rows; the trailing
    ``h.shape[1] - q_rows`` calibrated-outlier channels run a second small
    bf16 GEMM against ``hi_ref`` — exact for exactly the channels absmax
    quantization cannot represent.
    """
    if w8a8:
        if hi_ref is not None and w_ref.shape[1] < h.shape[1]:
            m = w_ref.shape[1]
            hq, sx = _quantize_rows(h[:, :m].astype(jnp.float32))
            acc = jax.lax.dot_general(hq, w_ref[l], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            hi = jnp.dot(h[:, m:].astype(cdt), hi_ref[l].astype(cdt),
                         preferred_element_type=jnp.float32)
            return acc.astype(jnp.float32) * sx * s_ref[l] + hi
        hq, sx = _quantize_rows(h.astype(jnp.float32))
        acc = jax.lax.dot_general(hq, w_ref[l], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sx * s_ref[l]
    acc = jnp.dot(h, w_ref[l].astype(h.dtype),
                  preferred_element_type=jnp.float32)
    if s_ref is not None:
        acc = acc * s_ref[l]  # [1, out] fp32 epilogue
    return acc


def _mm_ctx_masked(ctx_parts, outw_ref, ohi_ref, l, s_ref, kh, cdt):
    """Out-proj W8A8 with per-head-tail outliers (masked-int8 + bf16 tails).

    ``ctx_parts``: the per-head attention outputs [T, hd] BEFORE concat —
    the structural form makes both the tail slice and the tail-excluding
    absmax plain slices (no mask multiply; models/quant.matmul_w8a8's
    masked branch is the XLA twin of this math). The int8 ref's tail rows
    are zero, so the clipped tail lanes in the quantized block never reach
    the output.
    """
    hd = ctx_parts[0].shape[-1]
    ctx = jnp.concatenate(ctx_parts, axis=-1).astype(jnp.float32)
    lo = jnp.concatenate([o[:, :hd - kh] for o in ctx_parts], axis=-1)
    absmax = jnp.maximum(
        jnp.max(jnp.abs(lo.astype(jnp.float32)), axis=-1, keepdims=True),
        jnp.float32(2.0 ** -93))
    r = jnp.float32(127.0) / absmax
    q = jnp.clip(jnp.round(ctx * r), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, outw_ref[l], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    hi_in = jnp.concatenate([o[:, hd - kh:] for o in ctx_parts], axis=-1)
    hi = jnp.dot(hi_in.astype(cdt), ohi_ref[l].astype(cdt),
                 preferred_element_type=jnp.float32)
    return (acc.astype(jnp.float32) * (absmax * jnp.float32(1 / 127))
            * s_ref[l] + hi)


def _ln(xf, w, b, eps):
    """fp32 LayerNorm with E[x^2]-E[x]^2 statistics (reference semantics)."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mean) * inv * w.astype(jnp.float32) + b.astype(jnp.float32)


def _vmem_limit(L: int, d: int, hdim: int, wdtype_bytes: int) -> int:
    """Scoped-VMEM budget: the resident weight set plus activation headroom."""
    wbytes = L * (d * 3 * d + d * d + 2 * d * hdim) * wdtype_bytes
    return min(max(64 << 20, wbytes + (32 << 20)), 110 << 20)


def _weight_specs_operands(g, L: int, d: int, hdim: int, x, quantized: bool):
    """The 12 weight/bias specs+operands shared by every fused kernel,
    plus the four per-channel scale refs when ``g`` holds int8 dicts and
    the four bf16 outlier-group ("hi") refs for outlier-aware dicts
    (models/quant.quantize_stacked_params_outlier layout — the int8 blocks
    may then cover fewer input rows than the activation, so every spec is
    derived from the actual operand shape)."""

    def wmat(key):
        return g[key]["q"] if quantized else g[key].astype(x.dtype)

    operands = [
        g["ln1_w"], g["ln1_b"],
        wmat("qkv_w"), g["qkv_b"],
        wmat("out_w"), g["out_b"],
        g["ln2_w"], g["ln2_b"],
        wmat("fc1_w"), g["fc1_b"],
        wmat("fc2_w"), g["fc2_b"],
    ]
    if quantized:
        operands += [g["qkv_w"]["scale"], g["out_w"]["scale"],
                     g["fc1_w"]["scale"], g["fc2_w"]["scale"]]
        if "hi" in g["qkv_w"]:
            operands += [g["qkv_w"]["hi"], g["out_w"]["hi"],
                         g["fc1_w"]["hi"], g["fc2_w"]["hi"]]
    specs = [_whole(np.shape(op)) for op in operands]
    return specs, operands


def _block_kernel(
    x_ref, ln1w_ref, ln1b_ref, qkvw_ref, qkvb_ref, outw_ref, outb_ref,
    ln2w_ref, ln2b_ref, fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, *rest,
    num_heads: int, head_dim: int, eps: float, images_per_cell: int,
    depth: int = 1, quantized: bool = False, w8a8: bool = False,
    outlier: bool = False, stage_major: bool = False,
):
    """``depth`` consecutive layers per launch, per-image [T, D] GEMMs.

    Weight refs carry a leading [depth] axis; with depth > 1 the residual
    stream stays in VMEM across the whole layer group, so the per-boundary
    HBM round trip of the activations is paid once per group instead of
    once per layer.

    ``quantized``: weight refs hold int8 and ``rest`` leads with four
    per-output-channel fp32 scale refs [depth, 1, out] (qkv/out/fc1/fc2);
    each matmul casts int8→bf16 on the way into the MXU and applies the
    scale to the fp32 accumulator (models/quant.matmul_q semantics).

    ``outlier``: four bf16 outlier-group refs follow the scales
    (models/quant layout): trailing-input-row groups for qkv/fc1/fc2 and
    the per-head context tails for out-proj run exact bf16 side-GEMMs.
    """
    if quantized and outlier:
        qs, os_, f1s, f2s, qhi, ohi, f1hi, f2hi, o_ref = rest
    elif quantized:
        qs, os_, f1s, f2s, o_ref = rest
        qhi = ohi = f1hi = f2hi = None
    else:
        (o_ref,) = rest
        qs = os_ = f1s = f2s = qhi = ohi = f1hi = f2hi = None
    scale = float(1.0 / np.sqrt(head_dim))
    cdt = x_ref.dtype
    kh = ohi.shape[1] // num_heads if outlier else 0

    def _attn_one(qkv, l):
        ctx_parts = []
        for hh in range(num_heads):
            qo, ko, vo = attention._packed_offsets("slab", hh, num_heads,
                                                   head_dim)
            o, _ = attention._head_attention(
                qkv[:, qo:qo + head_dim], qkv[:, ko:ko + head_dim],
                qkv[:, vo:vo + head_dim], scale,
            )
            ctx_parts.append(o.astype(cdt))
        if w8a8 and outlier:
            return _mm_ctx_masked(ctx_parts, outw_ref, ohi, l, os_, kh, cdt)
        ctx = jnp.concatenate(ctx_parts, axis=-1)  # [T, D]
        return _mm(ctx, outw_ref, l, os_, w8a8)

    def _layer(xs, l):
        """One encoder layer over ``len(xs)`` independent [T, D] streams,
        stage-major: each stage runs for every stream before the next stage
        starts, so stream B's VPU stage (LN / quantize / softmax / GELU)
        sits adjacent in program order to stream A's MXU stage with no data
        dependency between them. Mosaic's scheduler then overlaps the units
        (scripts/probe_w8a8_overlap on v5e: adjacent independent VPU||MXU
        hides 76% of the VPU time; image-major order — singleton ``xs`` —
        exposes every between-GEMM VPU stage serially instead)."""
        hs = [_ln(x, ln1w_ref[l], ln1b_ref[l], eps) for x in xs]
        if not w8a8:  # w8a8 quantizes from the fp32 LN output directly
            hs = [h.astype(cdt) for h in hs]
        qkvs = [(_mm(h, qkvw_ref, l, qs, w8a8, qhi, cdt)
                 + qkvb_ref[l].astype(jnp.float32)).astype(cdt) for h in hs]
        attns = [_attn_one(qkv, l) for qkv in qkvs]
        xs = [x + a + outb_ref[l].astype(jnp.float32)  # residual 1
              for x, a in zip(xs, attns)]
        hs = [_ln(x, ln2w_ref[l], ln2b_ref[l], eps) for x in xs]
        if not w8a8:
            hs = [h.astype(cdt) for h in hs]
        hids = [_gelu_fast(_mm(h, fc1w_ref, l, f1s, w8a8, f1hi, cdt)
                           + fc1b_ref[l].astype(jnp.float32)) for h in hs]
        mlps = [_mm(hid if w8a8 else hid.astype(cdt),
                    fc2w_ref, l, f2s, w8a8, f2hi, cdt) for hid in hids]
        return [x + m + fc2b_ref[l].astype(jnp.float32)  # residual 2
                for x, m in zip(xs, mlps)]

    def _run(streams):
        xs = [x_ref[i].astype(jnp.float32) for i in streams]
        for l in range(depth):  # static unroll keeps weights VMEM-resident
            xs = _layer(xs, l)
        for i, xv in zip(streams, xs):
            o_ref[i] = xv.astype(o_ref.dtype)

    if stage_major and images_per_cell > 1:
        _run(list(range(images_per_cell)))
    else:  # image-major: one stream at a time (the round-3 order)
        for img in range(images_per_cell):
            _run([img])


# Above this per-layer weight footprint (bytes, bf16), fall back to the
# per-op path — the fused block must keep weights + activations in VMEM.
# Measured on v5e (scripts/probe_midsize.py, bs-saturated, vs per-op XLA):
#   D=384  3.4 MB:  +36%   (13.1k vs 9.7k img/s; the stack kernel does +46%)
#   D=512  6.3 MB:  +31%   (8.3k vs 6.3k img/s, 132 TF/s)
#   D=768 14.2 MB:  +12.5% (4.1k vs 3.6k img/s, 144 TF/s = 94% measured peak)
#   D=1024 25.2 MB @577 tokens: +10.6% (377 vs 341 img/s, 144 TF/s)
#   D=1280 39.3 MB @257 tokens (ViT-H/14): +6.1% bf16 (418 vs 394 img/s,
#     139.7 TF/s); int8 (19.7 MB resident): +10.2% (434 img/s, 145.2 TF/s =
#     93% measured peak) — round-3 probe, the gate was the only blocker.
# Round 1 assumed big models gain nothing; that was the unmeasured 4 MB gate
# talking — whole-layer fusion wins at every size that fits VMEM, through
# ViT-H's 39.3 MB (the _vmem_limit budget tops out at 110 MB scoped VMEM).
FUSED_BLOCK_MAX_WEIGHT_BYTES = 40 << 20


def _group_call(x: jax.Array, g, config: ViTConfig, depth: int,
                images_per_cell: int, interpret: bool,
                w8a8: bool = False,
                stage_major: bool | None = None) -> jax.Array:
    """pallas_call for ``depth`` layers; ``g`` leaves carry a [depth] axis.

    Matmul weight leaves may be int8 quantized dicts ({"q", "scale"},
    models/quant layout) — the kernel then keeps int8 residency in VMEM
    (half the footprint) and applies the per-channel scales as fp32
    matmul epilogues.
    """
    from ..models import quant

    b, t, d = x.shape
    hdim = config.hidden_dim
    quantized = quant.is_quantized(g["qkv_w"])
    outlier = quantized and "hi" in g["qkv_w"]
    if outlier and not w8a8:
        raise ValueError(
            "outlier-aware quantized params (bf16 'hi' groups) require the "
            "w8a8 path; weight-only int8 has no activation scales to protect")

    if stage_major is None:
        # Default: stage-major for W8A8 multi-image cells (its quantize/LN
        # VPU share is the measured bound, probe_w8a8_overlap); image-major
        # for bf16 (98% of measured ceiling already — don't disturb).
        stage_major = bool(w8a8 and quantized and images_per_cell > 1)

    kernel = functools.partial(
        _block_kernel, num_heads=config.num_heads, head_dim=config.head_dim,
        eps=config.eps, images_per_cell=images_per_cell, depth=depth,
        quantized=quantized, w8a8=w8a8 and quantized,
        outlier=outlier and w8a8, stage_major=stage_major,
    )

    vmem_limit = _vmem_limit(depth, d, hdim,
                             1 if quantized else x.dtype.itemsize)
    w_specs, w_operands = _weight_specs_operands(g, depth, d, hdim, x,
                                                 quantized)
    in_specs = [pl.BlockSpec((images_per_cell, t, d),
                             lambda i: (i, 0, 0))] + w_specs
    operands = [x] + w_operands

    return pl.pallas_call(
        kernel,
        grid=(b // images_per_cell,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((images_per_cell, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        # Donate x's buffer to the output: inside the encoder scan the carry
        # is dead after the call, so XLA drops the per-layer activation copy
        # it otherwise inserts for the while-loop buffer (measured 0.24 ms x
        # depth = ~5% of the ViT-B forward in the device trace). When x IS
        # still live (e.g. the trainable path saves it as the VJP residual)
        # XLA reinstates the copy — aliasing is a hint, never a hazard.
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(*operands)


def fused_encoder_layer(
    x: jax.Array,
    lp,
    config: ViTConfig,
    *,
    images_per_cell: int | None = None,
    interpret: bool | None = None,
    w8a8: bool = False,
    stage_major: bool | None = None,
) -> jax.Array:
    """One pre-LN encoder layer, fully fused. x: [B, T, D] → [B, T, D].

    ``lp`` is one layer's slice of the stacked params (models/vit layout:
    qkv_w [D, 3D], out_w [D, D], fc1_w [D, H], fc2_w [H, D], fp32 LN/biases).

    ``stage_major``: run the cell's images stage-by-stage instead of
    image-by-image so independent VPU/MXU work sits adjacent for the Mosaic
    scheduler (None = auto: on for W8A8 multi-image cells).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b = x.shape[0]
    if images_per_cell is None:
        # v5e sweep (ViT-Tiny bs1024): 2 images/cell is ~8% faster than 1
        # (weight reuse within a cell); 4/8 are equal to 2.
        images_per_cell = 2
    while b % images_per_cell:
        images_per_cell -= 1
    g = jax.tree.map(lambda a: a[None], lp)
    return _group_call(x, g, config, 1, images_per_cell, interpret, w8a8,
                       stage_major)


def fused_encoder_group(
    x: jax.Array,
    layers,
    config: ViTConfig,
    *,
    group_size: int,
    images_per_cell: int | None = None,
    interpret: bool | None = None,
    w8a8: bool = False,
) -> jax.Array:
    """The encoder as a scan over groups of ``group_size`` fused layers.

    Between-layer HBM round trips of the residual stream are paid once per
    GROUP instead of once per layer (the per-image analogue of the
    whole-encoder stack kernel, for models whose full stack cannot fit
    VMEM but a few layers' weights can).

    Measured NEGATIVE at D=768 (ViT-B bs256, v5e): group2 67.1 / group3
    64.3 vs per-layer 61.3 ms/batch — a 28-43 MB resident weight group
    leaves too little VMEM for input-block pipelining, costing more than
    the ~6% boundary traffic it saves. Off by default; enabled only via
    kernels["fused_group_size"] (scripts/probe_midsize.py 'groupN').
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert config.depth % group_size == 0, (config.depth, group_size)
    b = x.shape[0]
    ipc = images_per_cell
    if ipc is None:
        ipc = 2
    while b % ipc:
        ipc -= 1
    grouped = jax.tree.map(
        lambda a: a.reshape((config.depth // group_size, group_size)
                            + a.shape[1:]),
        layers,
    )

    def step(h, g):
        return _group_call(h, g, config, group_size, ipc, interpret, w8a8), None

    x, _ = jax.lax.scan(step, x, grouped)
    return x


def supports(config: ViTConfig, dtype_bytes: int = 2) -> bool:
    """Whether this config can use the fused block: per-layer weights must
    fit the VMEM budget and the activation must be the erf GELU this kernel
    implements (tanh-approx configs use the per-op path)."""
    if config.gelu_approx != "erf":
        return False
    d, h = config.embed_dim, config.hidden_dim
    weight_bytes = (d * 3 * d + d * d + d * h + h * d) * dtype_bytes
    return weight_bytes <= FUSED_BLOCK_MAX_WEIGHT_BYTES


# ---------------------------------------------------------------------------
# Whole-ENCODER fused kernel: every layer of a small model in ONE launch.
#
# For ViT-Tiny the complete 12-layer weight stack is ~10.6 MB bf16 — it fits
# VMEM outright. Running the whole encoder per grid cell removes what the
# per-layer fused block still pays: an HBM round trip of the activations
# between every layer (2 x depth passes) and depth pallas_call launches per
# scan step. Weights use constant index maps, so Mosaic keeps them resident
# across the entire batch grid: HBM traffic collapses to x in + out once +
# weights once.
# ---------------------------------------------------------------------------


def _stack_kernel(
    x_ref, ln1w_ref, ln1b_ref, qkvw_ref, qkvb_ref, outw_ref, outb_ref,
    ln2w_ref, ln2b_ref, fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref, *rest,
    depth: int, num_heads: int, head_dim: int, eps: float,
    images_per_cell: int, seq_len: int, quantized: bool = False,
    w8a8: bool = False,
):
    """All layers, with the cell's images MERGED into the GEMM M dimension.

    x block is [ipc, t_pad, D] with t_pad a multiple of the sublane tile
    (16), padded outside the kernel. Everything except the attention core
    runs on the flat [ipc*t_pad, D] view, so the matmuls see an M of
    ipc*t_pad instead of 197 — round-1's flat-block attempt LOST because its
    197-row per-image slices were tile-misaligned and Mosaic paid relayouts;
    the padded t_pad makes every slice offset a tile multiple. Padded KV
    columns are masked in the attention softmax; padded query rows carry
    garbage in their own rows only and are sliced off outside.
    """
    if quantized:
        qs, os_, f1s, f2s, o_ref = rest
    else:
        (o_ref,) = rest
        qs = os_ = f1s = f2s = None
    scale = float(1.0 / np.sqrt(head_dim))
    ipc = images_per_cell
    t_pad = x_ref.shape[1]
    d = num_heads * head_dim

    neg = None
    if t_pad != seq_len:
        col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 1)
        neg = jnp.where(col < seq_len, 0.0, attention.MASK_VALUE).astype(
            jnp.float32
        )

    x = x_ref[...].reshape(ipc * t_pad, d).astype(jnp.float32)
    for l in range(depth):  # static unroll: weights stay VMEM-resident
        h = _ln(x, ln1w_ref[l], ln1b_ref[l], eps)
        if not w8a8:  # w8a8 quantizes from the fp32 LN output directly
            h = h.astype(x_ref.dtype)
        qkv = _mm(h, qkvw_ref, l, qs, w8a8)
        qkv = (qkv + qkvb_ref[l].astype(jnp.float32)).astype(x_ref.dtype)
        ctx_rows = []
        for img in range(ipc):
            qkv_i = qkv[img * t_pad:(img + 1) * t_pad]  # tile-aligned slice
            ctx_parts = []
            for hh in range(num_heads):
                qo, ko, vo = attention._packed_offsets(
                    "slab", hh, num_heads, head_dim
                )
                o, _ = attention._head_attention(
                    qkv_i[:, qo:qo + head_dim], qkv_i[:, ko:ko + head_dim],
                    qkv_i[:, vo:vo + head_dim], scale, neg,
                )
                ctx_parts.append(o.astype(x_ref.dtype))
            ctx_rows.append(jnp.concatenate(ctx_parts, axis=-1))
        ctx = jnp.concatenate(ctx_rows, axis=0)  # [ipc*t_pad, D]
        attn = _mm(ctx, outw_ref, l, os_, w8a8)
        x = x + attn + outb_ref[l].astype(jnp.float32)
        h = _ln(x, ln2w_ref[l], ln2b_ref[l], eps)
        if not w8a8:
            h = h.astype(x_ref.dtype)
        hid = _mm(h, fc1w_ref, l, f1s, w8a8)
        hid = hid + fc1b_ref[l].astype(jnp.float32)
        hid = _gelu_fast(hid)
        mlp = _mm(hid if w8a8 else hid.astype(x_ref.dtype),
                  fc2w_ref, l, f2s, w8a8)
        x = x + mlp + fc2b_ref[l].astype(jnp.float32)
    o_ref[...] = x.reshape(ipc, t_pad, d).astype(o_ref.dtype)


# The whole weight stack plus activations/temporaries must fit scoped VMEM.
# ViT-S's 40.5 MB stack measures faster than its per-layer fused block
# (14.1k vs 13.1k img/s, 130 TF/s), so the cap sits above it; ViT-B's
# 170 MB stack cannot fit.
FUSED_STACK_MAX_WEIGHT_BYTES = 44 << 20


def fused_encoder_stack(
    x: jax.Array,
    layers,
    config: ViTConfig,
    *,
    images_per_cell: int | None = None,
    interpret: bool | None = None,
    num_layers: int | None = None,
    w8a8: bool = False,
) -> jax.Array:
    """``num_layers`` consecutive encoder layers in one fused launch.

    ``layers`` is the stacked per-layer pytree (models/vit layout, leading
    layer axis of length ``num_layers``, default the whole ``config.depth``
    stack). x: [B, T, D] → [B, T, D].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d = x.shape
    L = config.depth if num_layers is None else num_layers
    nh, hd = config.num_heads, config.head_dim
    hdim = config.hidden_dim
    if images_per_cell is None:
        # v5e sweep (ViT-Tiny bs1024, encoder-only ms/batch): ipc=2 40.5,
        # ipc=4 38.5 (flat-M GEMMs reward the larger M); ipc=8's unrolled
        # kernel takes >9 min to compile — not worth it.
        images_per_cell = 4
    while b % images_per_cell:
        images_per_cell -= 1

    # Pad the token axis to the bf16 sublane tile so the kernel's flat-M
    # per-image slices are tile-aligned (the "new idea" vs round-1's losing
    # flat-block attempt: alignment, not raggedness).
    t_pad = -(-t // 16) * 16
    if t_pad != t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    from ..models import quant

    quantized = quant.is_quantized(layers["qkv_w"])
    if quantized and "hi" in layers["qkv_w"]:
        raise ValueError(
            "the whole-stack kernel has no outlier-aware W8A8 path (stack-"
            "class models route W8A8 per-layer; see models/vit.encoder)")

    kernel = functools.partial(
        _stack_kernel, depth=L, num_heads=nh, head_dim=hd, eps=config.eps,
        images_per_cell=images_per_cell, seq_len=t, quantized=quantized,
        w8a8=w8a8 and quantized,
    )

    vmem_limit = _vmem_limit(L, d, hdim, 1 if quantized else x.dtype.itemsize)
    w_specs, w_operands = _weight_specs_operands(layers, L, d, hdim, x,
                                                 quantized)
    in_specs = [pl.BlockSpec((images_per_cell, t_pad, d),
                             lambda i: (i, 0, 0))] + w_specs
    operands = [x] + w_operands

    out = pl.pallas_call(
        kernel,
        grid=(b // images_per_cell,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((images_per_cell, t_pad, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), x.dtype),
        # x is dead after the (single) stack launch — donate its buffer so
        # XLA skips the defensive output allocation + copy (same rationale
        # as _group_call's alias).
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(*operands)
    return out[:, :t] if t_pad != t else out


def fused_encoder_layer_flat(
    x: jax.Array,
    lp,
    config: ViTConfig,
    *,
    images_per_cell: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """One encoder layer via the flat-M stack kernel (num_layers=1).

    Same math as ``fused_encoder_layer`` but with the cell's images merged
    into the GEMM M dimension on a tile-padded token axis — the layout that
    wins for the whole-stack kernel. Drop-in for the ``encoder_block`` slot.

    Measured NEGATIVE result at D=768 (ViT-B bs256, v5e): 67.8 ms/batch vs
    62.5 for the per-image variant — at big D the GEMMs are already fat and
    the 197→208 token pad (+5.6% FLOPs) outweighs the aligned-M gain. Kept
    as a benchmarking alternate (scripts/probe_midsize.py 'fusedflat');
    production per-layer fusion stays per-image.
    """
    layers1 = jax.tree.map(lambda a: a[None], lp)
    return fused_encoder_stack(
        x, layers1, config, images_per_cell=images_per_cell,
        interpret=interpret, num_layers=1,
    )


def supports_stack(config: ViTConfig, dtype_bytes: int = 2) -> bool:
    """Whole-encoder fusion: the FULL weight stack must fit the VMEM budget."""
    if config.gelu_approx != "erf":
        return False
    d, h = config.embed_dim, config.hidden_dim
    per_layer = (d * 3 * d + d * d + d * h + h * d) * dtype_bytes
    return config.depth * per_layer <= FUSED_STACK_MAX_WEIGHT_BYTES


# ---------------------------------------------------------------------------
# Trainable fused layer: custom VJP with a fused rematerializing BACKWARD.
#
# The forward kernels above have no automatic gradient, which round 2 left as
# the known biggest unharvested perf item: training ran the per-op XLA
# forward, so the fused layer's +13% (ViT-B) was inference-only. This section
# closes that: one Pallas kernel recomputes the whole layer forward from the
# saved input x (flash-style rematerialization — the only residual is x, so
# training activation memory per layer is ONE [B, T, D] tensor) and emits dx
# plus every weight/bias/LN gradient. Weight grads accumulate in fp32 VMEM
# across a sequential batch grid, the same constant-index-map residency trick
# the forward uses for the weights themselves.
# ---------------------------------------------------------------------------


def _ln_fwd_stats(xf, w, b, eps):
    """LN forward returning (normalized x̂, inv_std, out) — the backward
    needs x̂ and inv."""
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    return xhat, inv, xhat * w.astype(jnp.float32) + b.astype(jnp.float32)


def _ln_bwd(dy, xhat, inv, w):
    """dx for y = x̂·w + b given dy (fp32). Returns (dx, dw_rows, db_rows)
    where dw/db still need the token-axis colsum."""
    dxhat = dy * w.astype(jnp.float32)
    dx = inv * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx, dy * xhat, dy


def _csum(x):
    """Token-axis colsum → [1, cols] fp32 (bias/LN grad accumulant)."""
    return jnp.sum(x, axis=0, keepdims=True)


def _dot(a, bmat, contract=((1,), (1,))):
    return jax.lax.dot_general(
        a, bmat, (contract, ((), ())), preferred_element_type=jnp.float32
    )


def _attn_recompute(x0, ln1w, ln1b, qkvw, qkvb, *, eps, num_heads, head_dim,
                    cdt):
    """Forward recompute of the attention half from x0 (fp32 [T, D]) —
    exactly ``_block_kernel``'s math/casts. Returns
    (xhat1, inv1, h1c, qkvc, ctx)."""
    scale = float(1.0 / np.sqrt(head_dim))
    f32 = jnp.float32
    xhat1, inv1, h1 = _ln_fwd_stats(x0, ln1w, ln1b, eps)
    h1c = h1.astype(cdt)
    qkv = _dot(h1c, qkvw.astype(cdt), ((1,), (0,)))
    qkvc = (qkv + qkvb.astype(f32)).astype(cdt)
    ctx_parts = []
    for hh in range(num_heads):
        qo, ko, vo = attention._packed_offsets("slab", hh, num_heads,
                                               head_dim)
        o, _ = attention._head_attention(
            qkvc[:, qo:qo + head_dim], qkvc[:, ko:ko + head_dim],
            qkvc[:, vo:vo + head_dim], scale,
        )
        ctx_parts.append(o.astype(cdt))
    return xhat1, inv1, h1c, qkvc, jnp.concatenate(ctx_parts, axis=-1)


# The backward runs as THREE lean kernels rather than one monolith. A single
# whole-layer backward (weights + fp32 grad accumulators + both branches'
# temporaries resident at once) measured 76.9 MB of scoped VMEM — over the
# ~66 MB stack budget XLA grants the call inside the training while-loop
# (vmem_limit_bytes raises Mosaic's own ceiling but not XLA's stack budget,
# so the monolith failed to compile on TPU). Splitting at the residual
# boundary keeps each kernel's resident set small (attn ≈ 20 MB,
# MLP ≈ 40 MB at D=768) and costs only the attention-half recompute
# (~0.3 extra forward = +10% FLOPs over the monolith's 3x).


def _attn_half_fwd_kernel(
    x_ref, ln1w_ref, ln1b_ref, qkvw_ref, qkvb_ref, outw_ref, outb_ref,
    x2_ref, *, num_heads: int, head_dim: int, eps: float,
    images_per_cell: int,
):
    """x → x2 = x + proj(attention(LN1(x))), x2 emitted fp32."""
    cdt = x_ref.dtype
    f32 = jnp.float32
    for img in range(images_per_cell):
        x0 = x_ref[img].astype(f32)
        _, _, _, _, ctx = _attn_recompute(
            x0, ln1w_ref[0], ln1b_ref[0], qkvw_ref[0], qkvb_ref[0],
            eps=eps, num_heads=num_heads, head_dim=head_dim, cdt=cdt,
        )
        attn = _dot(ctx, outw_ref[0].astype(cdt), ((1,), (0,)))
        x2_ref[img] = x0 + attn + outb_ref[0].astype(f32)


def _mlp_bwd_kernel(
    x2_ref, do_ref, ln2w_ref, ln2b_ref, fc1w_ref, fc1b_ref, fc2w_ref,
    fc2b_ref, dx2_ref, dln2w_ref, dln2b_ref, dfc1w_ref, dfc1b_ref,
    dfc2w_ref, dfc2b_ref, *, eps: float, cdt, images_per_cell: int,
):
    """MLP-branch backward from the fp32 residual x2; emits fp32 dx2."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln2w_ref, dln2b_ref, dfc1w_ref, dfc1b_ref, dfc2w_ref,
                  dfc2b_ref):
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32
    for img in range(images_per_cell):
        x2 = x2_ref[img]              # fp32 [T, D]
        do = do_ref[img].astype(f32)  # [T, D]

        xhat2, inv2, h2 = _ln_fwd_stats(x2, ln2w_ref[0], ln2b_ref[0], eps)
        h2c = h2.astype(cdt)
        hid_pre = _dot(h2c, fc1w_ref[0].astype(cdt), ((1,), (0,)))
        hid_pre = hid_pre + fc1b_ref[0].astype(f32)  # [T, H] fp32
        hidc = _gelu_fast(hid_pre).astype(cdt)

        dmc = do.astype(cdt)
        dfc2w_ref[...] += _dot(hidc, dmc, ((0,), (0,)))[None]
        dfc2b_ref[...] += _csum(do)
        dhid = _dot(dmc, fc2w_ref[0].astype(cdt))         # [T, H]
        dhid_pre = dhid * _gelu_fast_grad(hid_pre)       # fp32
        dhpc = dhid_pre.astype(cdt)
        dfc1w_ref[...] += _dot(h2c, dhpc, ((0,), (0,)))[None]
        dfc1b_ref[...] += _csum(dhid_pre)
        dh2 = _dot(dhpc, fc1w_ref[0].astype(cdt))         # [T, D]
        dx2_ln, dw_rows, db_rows = _ln_bwd(dh2, xhat2, inv2, ln2w_ref[0])
        dln2w_ref[...] += _csum(dw_rows)
        dln2b_ref[...] += _csum(db_rows)
        dx2_ref[img] = do + dx2_ln


# For big models (ViT-L/H) even the MLP-only backward's fp32 weight-grad
# accumulators (2·D·H·4 B = 33.6 MB at L, 50.4 MB at H) blow the in-loop
# VMEM stack budget. Split once more at the GELU boundary:
#   M1 ("light"): everything EXCEPT the two big weight grads — dx2, LN2/bias
#     grads — while streaming the recomputed hidden activations (hidc) and
#     the GELU-side cotangent (dhpc) to HBM in bf16.
#   M2 ("wgrad"): dfc1w/dfc2w only, chunked over H with grid (h_chunks,
#     cells): the current chunk's fp32 accumulators stay VMEM-resident
#     across the inner cell sweep (init at cell 0 of every chunk), so the
#     accumulator footprint divides by the chunk count.
# Cost: one extra HBM round trip of [B, T, H] bf16 ×2 streams (~0.4 ms/layer
# at ViT-H bs32 vs ~3 ms/layer for the recompute-in-M2 alternative).


def _mlp_light_bwd_kernel(
    x2_ref, do_ref, ln2w_ref, ln2b_ref, fc1w_ref, fc1b_ref, fc2w_ref,
    dx2_ref, hid_ref, dhp_ref, dln2w_ref, dln2b_ref, dfc1b_ref, dfc2b_ref,
    *, eps: float, cdt, images_per_cell: int,
):
    """MLP backward minus the big weight grads; emits hidc/dhpc streams."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln2w_ref, dln2b_ref, dfc1b_ref, dfc2b_ref):
            r[...] = jnp.zeros_like(r)

    f32 = jnp.float32
    for img in range(images_per_cell):
        x2 = x2_ref[img]              # fp32 [T, D]
        do = do_ref[img].astype(f32)  # [T, D]

        xhat2, inv2, h2 = _ln_fwd_stats(x2, ln2w_ref[0], ln2b_ref[0], eps)
        h2c = h2.astype(cdt)
        hid_pre = _dot(h2c, fc1w_ref[0].astype(cdt), ((1,), (0,)))
        hid_pre = hid_pre + fc1b_ref[0].astype(f32)  # [T, H] fp32
        hid_ref[img] = _gelu_fast(hid_pre).astype(cdt)

        dmc = do.astype(cdt)
        dfc2b_ref[...] += _csum(do)
        dhid = _dot(dmc, fc2w_ref[0].astype(cdt))        # [T, H]
        dhid_pre = dhid * _gelu_fast_grad(hid_pre)       # fp32
        dhpc = dhid_pre.astype(cdt)
        dhp_ref[img] = dhpc
        dfc1b_ref[...] += _csum(dhid_pre)
        dh2 = _dot(dhpc, fc1w_ref[0].astype(cdt))        # [T, D]
        dx2_ln, dw_rows, db_rows = _ln_bwd(dh2, xhat2, inv2, ln2w_ref[0])
        dln2w_ref[...] += _csum(dw_rows)
        dln2b_ref[...] += _csum(db_rows)
        dx2_ref[img] = do + dx2_ln


def _mlp_wgrad_kernel(
    x2_ref, do_ref, hid_ref, dhp_ref, ln2w_ref, ln2b_ref,
    dfc1w_ref, dfc2w_ref, *, eps: float, cdt, images_per_cell: int,
):
    """dfc1w/dfc2w for ONE H-chunk, accumulated over the inner cell sweep.

    h2c is recomputed from x2 per visit (an LN — VPU-only, free next to the
    two grad GEMMs); hidc/dhpc arrive via the bf16 streams M1 wrote.
    """

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dfc1w_ref[...] = jnp.zeros_like(dfc1w_ref)
        dfc2w_ref[...] = jnp.zeros_like(dfc2w_ref)

    for img in range(images_per_cell):
        _, _, h2 = _ln_fwd_stats(x2_ref[img], ln2w_ref[0], ln2b_ref[0], eps)
        h2c = h2.astype(cdt)
        dmc = do_ref[img].astype(cdt)
        dfc1w_ref[...] += _dot(h2c, dhp_ref[img], ((0,), (0,)))[None]
        dfc2w_ref[...] += _dot(hid_ref[img], dmc, ((0,), (0,)))[None]


def _attn_bwd_kernel(
    x_ref, dx2_ref, ln1w_ref, ln1b_ref, qkvw_ref, qkvb_ref, outw_ref,
    outb_ref, dx_ref, dln1w_ref, dln1b_ref, dqkvw_ref, dqkvb_ref,
    doutw_ref, doutb_ref, *, num_heads: int, head_dim: int, eps: float,
    images_per_cell: int,
):
    """Attention-branch backward: recomputes the half forward from x, walks
    the chain back from fp32 dx2. Nothing [T, T]-shaped touches HBM."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln1w_ref, dln1b_ref, dqkvw_ref, dqkvb_ref, doutw_ref,
                  doutb_ref):
            r[...] = jnp.zeros_like(r)

    scale = float(1.0 / np.sqrt(head_dim))
    cdt = x_ref.dtype
    for img in range(images_per_cell):
        x0 = x_ref[img].astype(jnp.float32)  # [T, D]
        dx2 = dx2_ref[img]                   # fp32 [T, D]

        xhat1, inv1, h1c, qkvc, ctx = _attn_recompute(
            x0, ln1w_ref[0], ln1b_ref[0], qkvw_ref[0], qkvb_ref[0],
            eps=eps, num_heads=num_heads, head_dim=head_dim, cdt=cdt,
        )

        dac = dx2.astype(cdt)
        doutw_ref[...] += _dot(ctx, dac, ((0,), (0,)))[None]
        doutb_ref[...] += _csum(dx2)
        dctx = _dot(dac, outw_ref[0].astype(cdt)).astype(cdt)  # [T, D]
        dq_parts, dk_parts, dv_parts = [], [], []
        for hh in range(num_heads):
            qo, ko, vo = attention._packed_offsets("slab", hh, num_heads,
                                                   head_dim)
            q = qkvc[:, qo:qo + head_dim]
            k = qkvc[:, ko:ko + head_dim]
            v = qkvc[:, vo:vo + head_dim]
            doh = dctx[:, hh * head_dim:(hh + 1) * head_dim]
            _, p = attention._head_attention(q, k, v, scale)
            dp = _dot(doh, v)                              # [T, T]
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            ds = (ds * scale).astype(cdt)
            dv_parts.append(_dot(p.astype(cdt), doh, ((0,), (0,))))
            dq_parts.append(_dot(ds, k, ((1,), (0,))))
            dk_parts.append(_dot(ds, q, ((0,), (0,))))
        # Slab packing: q heads | k heads | v heads.
        dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
        dqkv_c = dqkv.astype(cdt)                         # [T, 3D]
        dqkvb_ref[...] += _csum(dqkv)
        dqkvw_ref[...] += _dot(h1c, dqkv_c, ((0,), (0,)))[None]
        dh1 = _dot(dqkv_c, qkvw_ref[0].astype(cdt))        # [T, D]
        dx_ln1, dw_rows, db_rows = _ln_bwd(dh1, xhat1, inv1, ln1w_ref[0])
        dln1w_ref[...] += _csum(dw_rows)
        dln1b_ref[...] += _csum(db_rows)
        dx_ref[img] = (dx2 + dx_ln1).astype(dx_ref.dtype)


def _wspec_ops(g, keys, d, hdim, x):
    """(specs, operands) for a subset of the layer weights, matmul weights
    cast to the activation dtype (bf16 residency under bf16 compute)."""
    shapes = {"ln1_w": (1, d), "ln1_b": (1, d), "qkv_w": (1, d, 3 * d),
              "qkv_b": (1, 3 * d), "out_w": (1, d, d), "out_b": (1, d),
              "ln2_w": (1, d), "ln2_b": (1, d), "fc1_w": (1, d, hdim),
              "fc1_b": (1, hdim), "fc2_w": (1, hdim, d), "fc2_b": (1, d)}
    specs = [_whole(shapes[k]) for k in keys]
    operands = [g[k].astype(x.dtype) if k.endswith("_w") and g[k].ndim == 3
                else g[k] for k in keys]
    return specs, operands


# MLP-backward resident ceiling (bf16 weights + fp32 grad accumulators) for
# the SINGLE-kernel path; above it the light/wgrad split chunks the grads.
# Derived from the measured ~66 MB in-loop stack budget minus headroom for
# the [T, H] fp32 temporaries (ViT-B: 28.3 MB resident, fits; ViT-L's
# 50.3 MB would leave nothing for T=577 temps — chunks).
MLP_BWD_RESIDENT_BUDGET = 40 << 20
# Per-H-chunk fp32 accumulator cap for the wgrad kernel.
MLP_WGRAD_CHUNK_BUDGET = 32 << 20


def _pick_mlp_chunks(d: int, hdim: int, itemsize: int) -> int:
    """1 → single MLP-backward kernel; else the H-chunk count for the
    light/wgrad split (smallest divisor of H whose fp32 accumulators fit)."""
    if 2 * d * hdim * (itemsize + 4) <= MLP_BWD_RESIDENT_BUDGET:
        return 1
    for nc in (2, 3, 4, 5, 6, 8, 10, 16):
        if hdim % nc == 0 and 2 * d * (hdim // nc) * 4 <= \
                MLP_WGRAD_CHUNK_BUDGET:
            return nc
    raise ValueError(
        f"no H-chunking of hidden_dim={hdim} fits the wgrad VMEM budget"
    )


_ATTN_KEYS = ("ln1_w", "ln1_b", "qkv_w", "qkv_b", "out_w", "out_b")
_MLP_KEYS = ("ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b")


def _bwd_ctx(x: jax.Array, lp, config: ViTConfig, images_per_cell: int,
             interpret: bool | None):
    """Shared backward-stage setup (specs, compiler params, grad shapes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, d = x.shape
    hdim = config.hidden_dim
    ipc = images_per_cell
    while b % ipc:
        ipc -= 1
    g = jax.tree.map(lambda a: a[None], lp)
    itemsize = x.dtype.itemsize
    wb_attn = (d * 3 * d + d * d) * itemsize
    wb_mlp = 2 * d * hdim * itemsize
    ctx = {
        "interpret": interpret, "b": b, "t": t, "d": d, "hdim": hdim,
        "ipc": ipc, "g": g, "cdt": x.dtype, "wb_mlp": wb_mlp,
        "cell": pl.BlockSpec((ipc, t, d), lambda i: (i, 0, 0)),
        # 96 MB floor: at D>=1024 the 64 MB floor makes the relay's compile
        # helper fail (opaque HTTP 500 — probed round 4: the identical
        # kernel compiles at 80 MB and fails at 64).
        "params_attn": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(max(96 << 20, 3 * wb_attn + (24 << 20)),
                                 110 << 20)),
        "params_mlp": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=min(max(64 << 20, 3 * wb_mlp + (24 << 20)),
                                 110 << 20)),
        "grad_shape": {k: (1,) + np.shape(lp[k])
                       for k in _ATTN_KEYS + _MLP_KEYS},
    }
    return ctx


def fused_bwd_stage_x2(x: jax.Array, lp, config: ViTConfig, *,
                       images_per_cell: int = 1,
                       interpret: bool | None = None) -> jax.Array:
    """Backward stage 1: attention-half forward recompute, x → fp32 x2."""
    c = _bwd_ctx(x, lp, config, images_per_cell, interpret)
    attn_specs, attn_ops = _wspec_ops(c["g"], _ATTN_KEYS, c["d"], c["hdim"],
                                      x)
    return pl.pallas_call(
        functools.partial(
            _attn_half_fwd_kernel, num_heads=config.num_heads,
            head_dim=config.head_dim, eps=config.eps,
            images_per_cell=c["ipc"],
        ),
        grid=(c["b"] // c["ipc"],),
        in_specs=[c["cell"]] + attn_specs,
        out_specs=c["cell"],
        out_shape=jax.ShapeDtypeStruct((c["b"], c["t"], c["d"]),
                                       jnp.float32),
        compiler_params=c["params_attn"],
        interpret=c["interpret"],
    )(x, *attn_ops)


def fused_bwd_stage_mlp_light(x2: jax.Array, dout: jax.Array, lp,
                              config: ViTConfig, *, images_per_cell: int = 1,
                              interpret: bool | None = None):
    """Backward stage 2a (chunked route): everything in the MLP backward
    except the two big weight grads. Returns (dx2 fp32, hid_s, dhp_s
    activation streams, small-grad dict with leading [1] axes)."""
    c = _bwd_ctx(dout, lp, config, images_per_cell, interpret)
    light_keys = ("ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w")
    light_specs, light_ops = _wspec_ops(c["g"], light_keys, c["d"],
                                        c["hdim"], dout)
    hid_cell = pl.BlockSpec((c["ipc"], c["t"], c["hdim"]),
                            lambda i: (i, 0, 0))
    small_keys = ("ln2_w", "ln2_b", "fc1_b", "fc2_b")
    params_light = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=min(max(96 << 20, c["wb_mlp"] + (48 << 20)),
                             110 << 20),
    )
    light_outs = pl.pallas_call(
        functools.partial(_mlp_light_bwd_kernel, eps=config.eps,
                          cdt=c["cdt"], images_per_cell=c["ipc"]),
        grid=(c["b"] // c["ipc"],),
        in_specs=[c["cell"], c["cell"]] + light_specs,
        out_specs=[c["cell"], hid_cell, hid_cell]
        + [_whole(c["grad_shape"][k]) for k in small_keys],
        out_shape=[jax.ShapeDtypeStruct((c["b"], c["t"], c["d"]),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((c["b"], c["t"], c["hdim"]),
                                        c["cdt"]),
                   jax.ShapeDtypeStruct((c["b"], c["t"], c["hdim"]),
                                        c["cdt"])]
        + [jax.ShapeDtypeStruct(c["grad_shape"][k], jnp.float32)
           for k in small_keys],
        compiler_params=params_light,
        interpret=c["interpret"],
    )(x2, dout, *light_ops)
    small = {k: light_outs[3 + i] for i, k in enumerate(small_keys)}
    return light_outs[0], light_outs[1], light_outs[2], small


def fused_bwd_stage_mlp_wgrad(x2: jax.Array, dout: jax.Array,
                              hid_s: jax.Array, dhp_s: jax.Array, lp,
                              config: ViTConfig, *, images_per_cell: int = 1,
                              mlp_chunks: int = 2,
                              interpret: bool | None = None):
    """Backward stage 2b (chunked route): the two big MLP weight grads,
    H-chunked fp32 accumulators. Returns (dfc1_w [1,D,H], dfc2_w [1,H,D])."""
    c = _bwd_ctx(dout, lp, config, images_per_cell, interpret)
    hdim, d, t, ipc = c["hdim"], c["d"], c["t"], c["ipc"]
    if hdim % mlp_chunks:
        raise ValueError(
            f"mlp_chunks={mlp_chunks} must divide hidden_dim={hdim}")
    hc = hdim // mlp_chunks
    params_wgrad = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=min(2 * d * hc * 4 + (48 << 20), 110 << 20),
    )
    return pl.pallas_call(
        functools.partial(_mlp_wgrad_kernel, eps=config.eps, cdt=c["cdt"],
                          images_per_cell=ipc),
        grid=(mlp_chunks, c["b"] // ipc),
        in_specs=[
            pl.BlockSpec((ipc, t, d), lambda h, i: (i, 0, 0)),
            pl.BlockSpec((ipc, t, d), lambda h, i: (i, 0, 0)),
            pl.BlockSpec((ipc, t, hc), lambda h, i: (i, 0, h)),
            pl.BlockSpec((ipc, t, hc), lambda h, i: (i, 0, h)),
            pl.BlockSpec((1, d), lambda h, i: (0, 0)),
            pl.BlockSpec((1, d), lambda h, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, hc), lambda h, i: (0, 0, h)),
            pl.BlockSpec((1, hc, d), lambda h, i: (0, h, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, d, hdim), jnp.float32),
                   jax.ShapeDtypeStruct((1, hdim, d), jnp.float32)],
        compiler_params=params_wgrad,
        interpret=c["interpret"],
    )(x2, dout, hid_s, dhp_s, c["g"]["ln2_w"], c["g"]["ln2_b"])


def fused_bwd_stage_mlp_mono(x2: jax.Array, dout: jax.Array, lp,
                             config: ViTConfig, *, images_per_cell: int = 1,
                             interpret: bool | None = None):
    """Backward stage 2 (single-kernel route, D<=768-class widths):
    (x2, dOut) → (dx2 fp32, full MLP-grad dict with leading [1] axes)."""
    c = _bwd_ctx(dout, lp, config, images_per_cell, interpret)
    mlp_specs, mlp_ops = _wspec_ops(c["g"], _MLP_KEYS, c["d"], c["hdim"],
                                    dout)
    mlp_outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=config.eps, cdt=c["cdt"],
                          images_per_cell=c["ipc"]),
        grid=(c["b"] // c["ipc"],),
        in_specs=[c["cell"], c["cell"]] + mlp_specs,
        out_specs=[c["cell"]]
        + [_whole(c["grad_shape"][k]) for k in _MLP_KEYS],
        out_shape=[jax.ShapeDtypeStruct((c["b"], c["t"], c["d"]),
                                        jnp.float32)]
        + [jax.ShapeDtypeStruct(c["grad_shape"][k], jnp.float32)
           for k in _MLP_KEYS],
        compiler_params=c["params_mlp"],
        interpret=c["interpret"],
    )(x2, dout, *mlp_ops)
    return mlp_outs[0], {k: mlp_outs[1 + i] for i, k in enumerate(_MLP_KEYS)}


def fused_bwd_stage_attn(x: jax.Array, dx2: jax.Array, lp,
                         config: ViTConfig, *, images_per_cell: int = 1,
                         interpret: bool | None = None):
    """Backward stage 3: (x, fp32 dx2) → (dx, attention-grad dict with
    leading [1] axes). Recomputes the attention half from x in-kernel;
    nothing [T, T]-shaped touches HBM."""
    c = _bwd_ctx(x, lp, config, images_per_cell, interpret)
    attn_specs, attn_ops = _wspec_ops(c["g"], _ATTN_KEYS, c["d"], c["hdim"],
                                      x)
    attn_outs = pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, num_heads=config.num_heads,
            head_dim=config.head_dim, eps=config.eps,
            images_per_cell=c["ipc"],
        ),
        grid=(c["b"] // c["ipc"],),
        in_specs=[c["cell"], c["cell"]] + attn_specs,
        out_specs=[c["cell"]]
        + [_whole(c["grad_shape"][k]) for k in _ATTN_KEYS],
        out_shape=[jax.ShapeDtypeStruct((c["b"], c["t"], c["d"]), x.dtype)]
        + [jax.ShapeDtypeStruct(c["grad_shape"][k], jnp.float32)
           for k in _ATTN_KEYS],
        compiler_params=c["params_attn"],
        interpret=c["interpret"],
    )(x, dx2, *attn_ops)
    return attn_outs[0], {k: attn_outs[1 + i]
                          for i, k in enumerate(_ATTN_KEYS)}


def grads_to_leaf_dtypes(lp, grads):
    """Strip the leading [1] accumulator axis and cast each grad to its
    primal leaf's dtype (JAX cotangent contract)."""
    def leaf_dtype(k):
        a = lp[k]
        return a.dtype if hasattr(a, "dtype") else np.asarray(a).dtype

    return {k: v[0].astype(leaf_dtype(k)) for k, v in grads.items()}


def fused_encoder_layer_bwd(
    x: jax.Array,
    lp,
    dout: jax.Array,
    config: ViTConfig,
    *,
    images_per_cell: int = 1,
    mlp_chunks: int | None = None,
    interpret: bool | None = None,
):
    """Fused backward: (x [B,T,D], layer params, dOut [B,T,D]) → (dx, dlp).

    Three Pallas launches — attention-half forward recompute (x → fp32 x2),
    MLP backward (x2, dOut → dx2 + MLP grads), attention backward
    (x, dx2 → dx + attention grads) — so each kernel's resident set fits
    the per-call VMEM stack budget. For ViT-L/H-class widths the MLP stage
    itself splits into the light/wgrad pair (``_mlp_light_bwd_kernel`` /
    ``_mlp_wgrad_kernel``) with H-chunked fp32 accumulators. Gradient
    leaves are cast to the primal leaf dtypes (JAX cotangent contract);
    accumulation is fp32 throughout; x is the only residual the autodiff
    graph saves per layer.

    The stages are also exposed individually (``fused_bwd_stage_*``) so a
    compile-limited target can jit each as its OWN program: the relay's
    compile helper crashes on the combined D>=1024 program while every
    stage compiles standalone (scripts/probe_fused_bwd.py, round 4) —
    parallel/split_step's staged mode exploits exactly that.
    """
    b, t, d = x.shape
    hdim = config.hidden_dim
    kw = dict(images_per_cell=images_per_cell, interpret=interpret)
    x2 = fused_bwd_stage_x2(x, lp, config, **kw)
    if mlp_chunks is None:
        mlp_chunks = _pick_mlp_chunks(d, hdim, x.dtype.itemsize)
    if mlp_chunks == 1:
        dx2, mlp_grads = fused_bwd_stage_mlp_mono(x2, dout, lp, config, **kw)
    else:
        dx2, hid_s, dhp_s, mlp_grads = fused_bwd_stage_mlp_light(
            x2, dout, lp, config, **kw)
        wg = fused_bwd_stage_mlp_wgrad(x2, dout, hid_s, dhp_s, lp, config,
                                       mlp_chunks=mlp_chunks, **kw)
        mlp_grads["fc1_w"] = wg[0]
        mlp_grads["fc2_w"] = wg[1]
    dx, attn_grads = fused_bwd_stage_attn(x, dx2, lp, config, **kw)
    dlp = grads_to_leaf_dtypes(lp, mlp_grads)
    dlp.update(grads_to_leaf_dtypes(lp, attn_grads))
    return dx, dlp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_layer_diff(config: ViTConfig, x, lp):
    return fused_encoder_layer(x, lp, config)


def _fused_layer_fwd(config, x, lp):
    return fused_encoder_layer(x, lp, config), (x, lp)


def _fused_layer_bwd(config, res, g):
    x, lp = res
    dx, dlp = fused_encoder_layer_bwd(x, lp, g, config)
    return dx, dlp


_fused_layer_diff.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_encoder_layer_trainable(x: jax.Array, lp, config: ViTConfig):
    """Differentiable fused encoder layer (Pallas fwd AND bwd).

    Drop-in for the ``encoder_block`` kernel-table slot in training: forward
    is ``fused_encoder_layer``; backward is the fused rematerializing kernel
    (only residual: x). First-order reverse-mode only.
    """
    return _fused_layer_diff(config, x, lp)


# Resident ceiling for the ATTENTION backward kernel: its weights
# (activation dtype) + fp32 grad accumulators must fit the in-loop stack
# budget together with the per-image temporaries. The MLP side no longer
# gates anything — past MLP_BWD_RESIDENT_BUDGET it H-chunks automatically
# (_pick_mlp_chunks), so ViT-L (25 MB attn-resident) and ViT-H (39 MB)
# both qualify.
TRAINABLE_ATTN_RESIDENT_BUDGET = 52 << 20


def supports_trainable(config: ViTConfig, dtype_bytes: int = 2) -> bool:
    """Whether training can route through the fused layer + fused backward."""
    if config.gelu_approx != "erf":
        return False
    d, h = config.embed_dim, config.hidden_dim
    attn_resident = (d * 3 * d + d * d) * (dtype_bytes + 4)
    if attn_resident > TRAINABLE_ATTN_RESIDENT_BUDGET:
        return False
    try:
        _pick_mlp_chunks(d, h, dtype_bytes)
    except ValueError:
        return False
    return True