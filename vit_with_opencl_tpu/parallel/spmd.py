"""Multi-chip SPMD: device mesh, shardings, tensor/data-parallel execution.

The reference is strictly single-process, single-device — its only
"communication backend" is five out-of-order OpenCL queues and a hand-built
``cl_event`` DAG on one GPU (reference: ViT_opencl.c:845-861, 107-114;
SURVEY.md §2.3). This layer is the capability the reference lacks, built the
TPU way:

  * a ``jax.sharding.Mesh`` with ``("data", "model")`` axes over ICI;
  * **data parallelism**: batch sharded over ``data``, params replicated,
    zero per-step communication;
  * **tensor parallelism** (Megatron-style, explicit via ``shard_map``):
    attention heads and MLP hidden dim sharded over ``model`` — column-
    parallel QKV/fc1, row-parallel out-proj/fc2, one ``psum`` after each of
    the two row-parallel matmuls per layer, attention itself is
    head-parallel and communication-free;
  * a GSPMD (``jit`` + ``NamedSharding``) training step where XLA inserts
    the collectives automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ViTConfig
from ..models import vit

Params = Dict[str, Any]

# jax.jit caches on function identity; building a fresh shard_map closure per
# call would retrace and recompile the whole model every invocation. Compiled
# programs are memoized here instead, keyed on everything that shapes them.
_PROGRAM_CACHE: Dict[Any, Any] = {}


def _cached_program(key, builder):
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = _PROGRAM_CACHE[key] = builder()
    return fn


# ---------------------------------------------------------------------------
# Mesh
# ---------------------------------------------------------------------------


def make_mesh(
    data: int = 1,
    model: int = 1,
    *,
    devices: Optional[Any] = None,
) -> Mesh:
    """A ("data", "model") mesh. ``data*model`` must divide into the device
    count; defaults lay DP along the outer axis so TP rides the fastest ICI
    links within a chip group."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    need = data * model
    if devs.size < need:
        raise ValueError(f"need {need} devices, have {devs.size}")
    return Mesh(devs[:need].reshape(data, model), axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Tensor-parallel parameter layout
# ---------------------------------------------------------------------------
#
# The single-chip stacked layout packs QKV as [L, D, 3D] with the 3D axis
# ordered (q|k|v). For clean head-sharding the TP layout reorders it
# head-major: [L, D, nh, 3, hd] flattened to [L, D, nh*3*hd], so a shard of
# the last axis is a whole group of heads. out_proj is reshaped [L, nh*hd, D]
# (already head-major on its input dim).


def to_tp_layout(params: Params, config: ViTConfig) -> Params:
    from ..models import quant

    nh, hd, L, d = config.num_heads, config.head_dim, config.depth, config.embed_dim

    def reorder_out_axis(x, rows):
        # [..., rows, 3D] with (q|k|v)-major out axis → head-major nh*3*hd.
        x = x.reshape(L, rows, 3, nh, hd).transpose(0, 1, 3, 2, 4)
        return x.reshape(L, rows, nh * 3 * hd)

    lp = dict(params["layers"])
    qkv_w = lp["qkv_w"]
    if quant.is_quantized(qkv_w):
        # int8 weight-only dicts: the per-output-channel scale lives on the
        # same axis as q's out dim — reorder the two together so a model-axis
        # shard carries matching (q, scale) columns. Outlier-aware dicts
        # additionally carry a bf16 "hi" block whose out axis reorders the
        # same way (its ROWS are the k_d outlier input channels, identical
        # on every shard).
        new = {
            "q": reorder_out_axis(qkv_w["q"], qkv_w["q"].shape[1]),
            "scale": reorder_out_axis(qkv_w["scale"], 1),
        }
        if "hi" in qkv_w:
            new["hi"] = reorder_out_axis(qkv_w["hi"], qkv_w["hi"].shape[1])
        lp["qkv_w"] = new
    else:
        lp["qkv_w"] = reorder_out_axis(qkv_w, d)
    qkv_b = lp["qkv_b"].reshape(L, 3, nh, hd).transpose(0, 2, 1, 3)
    lp["qkv_b"] = qkv_b.reshape(L, nh * 3 * hd)
    out = dict(params)
    out["layers"] = lp
    return out


def _fc2_outlier_to_masked(w: Dict[str, Any], n_model: int) -> Dict[str, Any]:
    """fc2 outlier dict, split form ({q: [L, H-k, D], hi: [L, k, D]}) →
    masked-trailing form ({q: [L, H, D] with the last k rows zero, hi
    unchanged}) so the q rows shard evenly over "model" in alignment with
    the column-parallel fc1 output slices. Exact: the appended rows are
    zero, the per-output-channel scale is row-count-invariant.

    The calibrated plan puts every fc2 outlier channel in the GLOBAL
    trailing group, which lands entirely in the LAST model shard's hidden
    slice — so k must fit one shard's slice (k <= H/n_model; the default
    plan width 128 fits any production split).
    """
    q = np.asarray(w["q"])
    k = w["hi"].shape[1]
    h_total = q.shape[1] + k
    if h_total % n_model:
        raise ValueError(
            f"hidden_dim {h_total} not divisible by model axis {n_model}")
    if k > h_total // n_model:
        raise ValueError(
            f"fc2 outlier group ({k} channels) exceeds one model shard's "
            f"hidden slice ({h_total // n_model}); re-plan with "
            f"k_h <= hidden_dim / n_model for TP serving")
    zeros = np.zeros((q.shape[0], k, q.shape[2]), q.dtype)
    return {"q": np.concatenate([q, zeros], axis=1),
            "scale": np.asarray(w["scale"]), "hi": np.asarray(w["hi"])}


def _weight_spec(leaf: Any, spec: P, hi_spec: Optional[P] = None) -> Any:
    """Spec for a (possibly int8-quantized) matmul weight leaf.

    Column-parallel weights shard their out axis: the per-output-channel
    scale shards with it. Row-parallel weights shard the in axis: the scale
    (out-channel-indexed, and commuting with the psum) stays replicated.

    Outlier-aware dicts carry a bf16 "hi" block: ``hi_spec`` says how it
    shards (defaults to the q spec for column-parallel weights, where the
    hi out axis shards with q's).
    """
    from ..models import quant

    if not quant.is_quantized(leaf):
        return spec
    out_axis_sharded = len(spec) >= 3 and spec[2] is not None
    d = {
        "q": spec,
        "scale": P(None, None, "model") if out_axis_sharded else P(),
    }
    if isinstance(leaf, dict) and "hi" in leaf:
        d["hi"] = hi_spec if hi_spec is not None else spec
    return d


def tp_pspecs(params: Params, config: ViTConfig) -> Params:
    """PartitionSpec tree matching the TP layout: column-parallel QKV/fc1,
    row-parallel out/fc2, everything else replicated.

    Outlier-aware hi groups: qkv/fc1 shard hi's OUT axis with q's; out-proj
    shards hi's per-head-tail ROWS with its head-group row shards; fc2
    (masked-trailing form, ``_fc2_outlier_to_masked``) replicates hi — it is
    tiny (k_h x D bf16) and only the last shard's partial consumes it.
    """
    specs = jax.tree.map(lambda _: P(), params)
    specs["layers"] = dict(specs["layers"])
    lp = params["layers"]
    specs["layers"]["qkv_w"] = _weight_spec(lp["qkv_w"], P(None, None, "model"))
    specs["layers"]["qkv_b"] = P(None, "model")
    specs["layers"]["out_w"] = _weight_spec(lp["out_w"], P(None, "model", None),
                                            hi_spec=P(None, "model", None))
    specs["layers"]["fc1_w"] = _weight_spec(lp["fc1_w"], P(None, None, "model"))
    specs["layers"]["fc1_b"] = P(None, "model")
    specs["layers"]["fc2_w"] = _weight_spec(lp["fc2_w"], P(None, "model", None),
                                            hi_spec=P())
    return specs


def shard_params_tp(params: Params, mesh: Mesh, config: ViTConfig) -> Params:
    """Re-layout + place params for tensor parallelism."""
    from ..models import quant

    n_model = mesh.shape["model"]
    if config.num_heads % n_model:
        raise ValueError(
            f"num_heads {config.num_heads} not divisible by model axis {n_model}"
        )
    if config.hidden_dim % n_model:
        raise ValueError(
            f"hidden_dim {config.hidden_dim} not divisible by model axis {n_model}"
        )
    tp = to_tp_layout(params, config)
    fc2 = tp["layers"]["fc2_w"]
    if quant.is_quantized(fc2) and "hi" in fc2:
        lp = dict(tp["layers"])
        lp["fc2_w"] = _fc2_outlier_to_masked(fc2, n_model)
        tp = dict(tp)
        tp["layers"] = lp
    specs = tp_pspecs(tp, config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tp, specs
    )


# ---------------------------------------------------------------------------
# Tensor+data-parallel forward (shard_map, explicit collectives)
# ---------------------------------------------------------------------------


def _dot_q(x: jax.Array, w: Any, w8a8: bool = False, *,
           heads: Optional[tuple] = None,
           tail_shards: Optional[int] = None) -> jax.Array:
    """x @ w in fp32, transparently handling int8 {q, scale} weights.

    Unlike ``quant.matmul_q`` this keeps the fp32 accumulator (no downcast,
    no bias) so row-parallel callers can psum at full precision — the scale
    is per output channel and commutes with the psum.

    ``w8a8``: additionally quantize the activation per token and run the
    GEMM int8×int8 on the MXU's double-rate int path (quant.matmul_w8a8
    semantics). Both scales are local to the shard and commute with the
    row-parallel psum, so TP composition needs no extra collectives.

    Outlier-aware dicts (bf16 ``hi`` groups, quantize_stacked_params_outlier)
    compose per shard — each representation stays shard-local:
      * split form (q rows < x channels; qkv/fc1): the k_d outlier input
        rows are replicated, the hi GEMM's out axis shards with q's;
      * masked per-head form (``heads=(nh_loc, hd)``; out-proj): each
        shard's head-group rows carry their own zeroed tails + hi rows —
        the LOCAL per-token absmax (excluding local tails) commutes with
        the row-parallel psum exactly like the plain-W8A8 scale;
      * masked trailing form (``tail_shards=n_model``; fc2 via
        ``_fc2_outlier_to_masked``): every global outlier channel lives in
        the LAST shard's hidden slice — that shard excludes its tail from
        the absmax and adds the hi GEMM; other shards quantize plainly.
    """
    from ..models import quant

    if quant.is_quantized(w):
        if isinstance(w, dict) and "hi" in w:
            if not w8a8:
                raise ValueError(
                    "outlier-aware quantized params (bf16 'hi' groups) "
                    "require w8a8=True — weight-only int8 has no hi path")
            return _dot_q_outlier(x, w, heads=heads, tail_shards=tail_shards)
        if w8a8:
            xq, sx = quant.quantize_act(x)
            acc = jax.lax.dot_general(
                xq, w["q"], (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * sx * w["scale"][..., 0, :]
        out = jnp.dot(x, w["q"].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return out * w["scale"][..., 0, :]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _dot_q_outlier(x: jax.Array, w: Dict[str, jax.Array], *,
                   heads: Optional[tuple], tail_shards: Optional[int]):
    """Shard-local outlier-aware W8A8 dot (fp32 accumulator, no bias)."""
    from ..models import quant

    dn = (((x.ndim - 1,), (0,)), ((), ()))
    din = x.shape[-1]
    m = w["q"].shape[0]
    f32 = jnp.float32
    if m < din:
        # split form: trailing outlier input rows run bf16 (qkv/fc1).
        xq, sx = quant.quantize_act(x[..., :m])
        acc = jax.lax.dot_general(xq, w["q"], dn,
                                  preferred_element_type=jnp.int32)
        hi = jnp.dot(x[..., m:], w["hi"].astype(x.dtype),
                     preferred_element_type=f32)
        return acc.astype(f32) * sx * w["scale"][..., 0, :] + hi
    if heads is not None:
        # masked per-head form (out-proj): local heads' tails are zero rows
        # in q AND excluded from the absmax; tails run bf16.
        nh_loc, hd = heads
        kh = w["hi"].shape[0] // nh_loc
        mask = np.zeros(din, bool)
        for h in range(nh_loc):
            mask[h * hd + hd - kh:(h + 1) * hd] = True
        keep = jnp.asarray(~mask, f32)
        xf = x.astype(f32)
        absmax = jnp.maximum(jnp.max(jnp.abs(xf) * keep, axis=-1,
                                     keepdims=True), f32(2.0 ** -93))
        r = f32(127.0) / absmax
        xq = jnp.clip(jnp.round(xf * r), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w["q"], dn,
                                  preferred_element_type=jnp.int32)
        x3 = x.reshape(x.shape[:-1] + (nh_loc, hd))
        x_hi = x3[..., hd - kh:].reshape(x.shape[:-1] + (nh_loc * kh,))
        hi = jnp.dot(x_hi, w["hi"].astype(x.dtype),
                     preferred_element_type=f32)
        return (acc.astype(f32) * (absmax * f32(1 / 127))
                * w["scale"][..., 0, :] + hi)
    if tail_shards is None:
        raise ValueError(
            "masked outlier weight needs heads= (out-proj) or tail_shards= "
            "(fc2) to locate its outlier channels on this shard")
    # masked trailing form (fc2): the global outlier tail lives entirely in
    # the LAST shard's slice.
    k = w["hi"].shape[0]
    is_last = (jax.lax.axis_index("model") == tail_shards - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (din,), 0)
    keep = jnp.where(is_last & (col >= din - k), 0.0, 1.0).astype(f32)
    xf = x.astype(f32)
    absmax = jnp.maximum(jnp.max(jnp.abs(xf) * keep, axis=-1, keepdims=True),
                         f32(2.0 ** -93))
    r = f32(127.0) / absmax
    xq = jnp.clip(jnp.round(xf * r), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w["q"], dn, preferred_element_type=jnp.int32)
    hi = jnp.dot(x[..., din - k:], w["hi"].astype(x.dtype),
                 preferred_element_type=f32)
    hi = hi * jnp.where(is_last, f32(1.0), f32(0.0))
    return (acc.astype(f32) * (absmax * f32(1 / 127)) * w["scale"][..., 0, :]
            + hi)


def _tp_block(h, lp, config: ViTConfig, n_model: int, kernels,
              w8a8: bool = False):
    """One encoder layer on a model-axis shard: local heads + local hidden
    slice, two psums (after out-proj and after fc2)."""
    nh_loc = config.num_heads // n_model
    hd = config.head_dim
    b, t, d = h.shape

    # Attention: column-parallel QKV (local heads), head-parallel core,
    # row-parallel out-proj + psum.
    x = kernels["layer_norm"](h, lp["ln1_w"], lp["ln1_b"], config.eps)
    qkv = _dot_q(x, lp["qkv_w"], w8a8)
    qkv = (qkv + lp["qkv_b"]).astype(h.dtype)  # [B, T, nh_loc*3*hd] head-major
    if "attention_packed" in kernels:
        from ..ops.attention import packed_fused_attention

        ctx = packed_fused_attention(
            qkv, num_heads=nh_loc, head_dim=hd, packing="per_head"
        )  # [B, T, nh_loc*hd]
    else:
        qkv = qkv.reshape(b, t, nh_loc, 3, hd).transpose(3, 0, 2, 1, 4)
        ctx = kernels["attention"](qkv[0], qkv[1], qkv[2], config)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nh_loc * hd)
    partial = _dot_q(ctx, lp["out_w"], w8a8, heads=(nh_loc, hd))
    attn_out = jax.lax.psum(partial, "model") + lp["out_b"]
    h = h + attn_out.astype(h.dtype)

    # MLP: column-parallel fc1 (local hidden slice), row-parallel fc2 + psum.
    x = kernels["layer_norm"](h, lp["ln2_w"], lp["ln2_b"], config.eps)
    hid = _dot_q(x, lp["fc1_w"], w8a8)
    hid = vit.gelu_erf((hid + lp["fc1_b"]).astype(h.dtype))
    partial = _dot_q(hid, lp["fc2_w"], w8a8, tail_shards=n_model)
    mlp_out = jax.lax.psum(partial, "model") + lp["fc2_b"]
    return h + mlp_out.astype(h.dtype), None


def tp_forward(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
    mesh: Mesh,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    attention_impl: str = "xla",
    return_logits: bool = False,
    w8a8: bool = False,
):
    """DPxTP forward over a ("data", "model") mesh.

    Batch is sharded over ``data``; within each data shard the layer weights
    are sharded over ``model`` as in ``shard_params_tp``. Returns globally
    assembled probabilities [B, num_classes]. ``w8a8`` runs the four block
    GEMMs int8×int8 (int8 param dicts required; see models/quant).
    """
    n_model = mesh.shape["model"]
    kernels = vit.resolve_kernels(attention_impl)
    pspecs = tp_pspecs(params, config)

    cache_key = ("tp", config, mesh, jnp.dtype(compute_dtype),
                 attention_impl, return_logits, w8a8,
                 jax.tree.structure(params))

    def fwd(imgs, p):
        x = vit.embed(imgs, p, config, compute_dtype)
        if config.pre_norm:
            x = kernels["layer_norm"](x, p["pre_ln_w"], p["pre_ln_b"], config.eps)
        block = functools.partial(
            _tp_block, config=config, n_model=n_model, kernels=kernels,
            w8a8=w8a8,
        )
        x, _ = jax.lax.scan(lambda h, lp: block(h, lp), x, p["layers"])
        x = vit.layer_norm(x, p["final_ln_w"], p["final_ln_b"], config.eps)
        logits = vit.classifier_logits(x.astype(jnp.float32), p, config,
                                       compute_dtype)
        if return_logits:
            return logits
        return jax.nn.softmax(logits, axis=-1)

    def build():
        return jax.jit(jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P("data"), pspecs),
            out_specs=P("data"),
            check_vma=False,
        ))

    return _cached_program(cache_key, build)(images, params)


# ---------------------------------------------------------------------------
# Sequence/context-parallel forward (tokens sharded over "model")
# ---------------------------------------------------------------------------
#
# Every ViT op except the attention core is per-token independent, so the
# token axis shards cleanly: LN, QKV/out-proj/MLP matmuls and residuals run
# on local token slices. Attention needs all KV positions: each shard
# all-gathers K/V (the guide's "all-gather + local attention" context
# parallelism — at ViT lengths the gather is tiny; ring attention becomes
# worthwhile only at orders-of-magnitude longer sequences).


def _sp_attention(q, k_loc, v_loc, config: ViTConfig, seq_len: int):
    """q: local [B, H, T_loc, hd]; K/V local shards → gathered full-T.
    Masks gathered padding tokens (token axis is padded to shard evenly)."""
    k = jax.lax.all_gather(k_loc, "model", axis=2, tiled=True)
    v = jax.lax.all_gather(v_loc, "model", axis=2, tiled=True)
    scale = np.float32(1.0 / np.sqrt(config.head_dim))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(kv_pos < seq_len, s, -0.7 * np.finfo(np.float32).max)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def sp_forward(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
    mesh: Mesh,
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    return_logits: bool = False,
    kv: str = "gather",
):
    """Sequence-parallel forward: token axis sharded over "model", batch over
    "data". Params replicated (pair with TP in later rounds if needed).

    ``kv`` selects how each token shard sees the full KV sequence:
      * "gather" — all-gather K/V then local whole-row attention (cheap at
        ViT lengths: the gather is tiny next to the matmuls);
      * "ring" — K/V stay sharded and rotate around the ring
        (ops/ring_attention), overlapping neighbor transfers with compute;
        the long-context path where a device can't hold the full KV.
    """
    if kv not in ("gather", "ring"):
        raise ValueError(f"unknown kv strategy {kv!r}")
    n_model = mesh.shape["model"]
    t = config.num_tokens
    t_pad = -(-t // n_model) * n_model
    nh, hd = config.num_heads, config.head_dim
    pspecs = jax.tree.map(lambda _: P(), params)

    cache_key = ("sp", config, mesh, jnp.dtype(compute_dtype), return_logits,
                 kv, jax.tree.structure(params))

    def fn(imgs, p):
        x = vit.embed(imgs, p, config, compute_dtype)  # [B_loc, T, D]
        if config.pre_norm:
            x = vit.layer_norm(x, p["pre_ln_w"], p["pre_ln_b"], config.eps)
        b = x.shape[0]
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        # take this shard's token slice
        sidx = jax.lax.axis_index("model")
        t_loc = t_pad // n_model
        x = jax.lax.dynamic_slice_in_dim(x, sidx * t_loc, t_loc, axis=1)

        def block(h, lp):
            hh = vit.layer_norm(h, lp["ln1_w"], lp["ln1_b"], config.eps)
            qkv = jnp.dot(hh, lp["qkv_w"], preferred_element_type=jnp.float32)
            qkv = (qkv + lp["qkv_b"]).astype(h.dtype)
            qkv = qkv.reshape(b, t_loc, 3, nh, hd).transpose(2, 0, 3, 1, 4)
            if kv == "ring":
                from ..ops.ring_attention import ring_attention_shard

                ctx = ring_attention_shard(
                    qkv[0], qkv[1], qkv[2], axis_name="model",
                    scale=float(1.0 / np.sqrt(hd)), seq_len=t,
                    shard_tokens=t_loc,
                )
            else:
                ctx = _sp_attention(qkv[0], qkv[1], qkv[2], config, t)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t_loc, nh * hd)
            attn = jnp.dot(ctx, lp["out_w"], preferred_element_type=jnp.float32)
            h = h + (attn + lp["out_b"]).astype(h.dtype)
            hh = vit.layer_norm(h, lp["ln2_w"], lp["ln2_b"], config.eps)
            hid = jnp.dot(hh, lp["fc1_w"], preferred_element_type=jnp.float32)
            hid = vit.gelu_erf((hid + lp["fc1_b"]).astype(h.dtype))
            mlp = jnp.dot(hid, lp["fc2_w"], preferred_element_type=jnp.float32)
            h = h + (mlp + lp["fc2_b"]).astype(h.dtype)
            return h, None

        x, _ = jax.lax.scan(block, x, p["layers"])
        x = vit.layer_norm(x, p["final_ln_w"], p["final_ln_b"], config.eps)
        # Gather token shards; slice off padding.
        full = jax.lax.all_gather(x, "model", axis=1, tiled=True)[:, :t]
        feats = full.astype(jnp.float32)
        logits = vit.classifier_logits(feats, p, config, compute_dtype)
        if return_logits:
            return logits
        return jax.nn.softmax(logits, axis=-1)

    def build():
        return jax.jit(jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("data"), pspecs),
            out_specs=P("data"),
            check_vma=False,
        ))

    return _cached_program(cache_key, build)(images, params)


# ---------------------------------------------------------------------------
# Composed sequence x tensor parallelism (Megatron-style SP)
# ---------------------------------------------------------------------------
#
# ``sp_forward`` above replicates the params — a correctness/latency path.
# This is the production composition: activations live TOKEN-sharded in the
# per-token regions (LN, residuals — 1/n activation memory) while the matmul
# weights stay MODEL-sharded exactly as in ``tp_forward``. Each block does
#   all_gather(tokens) → column-parallel matmul (local heads / local hidden)
#   → row-parallel matmul → psum_scatter(tokens)
# so the communication volume per layer equals TP's two psums (a psum IS an
# all-gather + reduce-scatter), but no rank ever materializes a full
# replicated activation between blocks. bf16 end to end; attention runs the
# packed Pallas flash kernel on the gathered sequence with padded KV columns
# masked (``true_seq_len``).


def _masked_xla_attention(qkv, b, t_pad, nh_loc, hd, seq_len):
    """Per-head-packed qkv [B, T_pad, nh*3*hd] → ctx, padded KV masked."""
    q, k, v = (
        qkv.reshape(b, t_pad, nh_loc, 3, hd).transpose(3, 0, 2, 1, 4)[i]
        for i in range(3)
    )
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s * np.float32(1.0 / np.sqrt(hd))
    kv_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(kv_pos < seq_len, s, -0.7 * np.finfo(np.float32).max)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return ctx.transpose(0, 2, 1, 3).reshape(b, t_pad, nh_loc * hd)


def sp_tp_forward(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
    mesh: Mesh,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    attention_impl: str = "flash",
    return_logits: bool = False,
    w8a8: bool = False,
):
    """Sequence-parallel x tensor-parallel forward over ("data", "model").

    ``params`` must be in the TP layout (``shard_params_tp``): weights are
    model-sharded; between blocks the activations are token-sharded. Returns
    probabilities [B, num_classes] (batch sharded over "data"). ``w8a8``
    runs the four block GEMMs int8×int8 (int8 param dicts required).
    """
    if attention_impl not in ("flash", "xla"):
        raise ValueError(f"unknown attention_impl {attention_impl!r}")
    n_model = mesh.shape["model"]
    t = config.num_tokens
    t_pad = -(-t // n_model) * n_model
    nh, hd = config.num_heads, config.head_dim
    nh_loc = nh // n_model
    pspecs = tp_pspecs(params, config)

    cache_key = ("sptp", config, mesh, jnp.dtype(compute_dtype),
                 attention_impl, return_logits, w8a8,
                 jax.tree.structure(params))

    def fn(imgs, p):
        x = vit.embed(imgs, p, config, compute_dtype)  # [B_loc, T, D]
        if config.pre_norm:
            x = vit.layer_norm(x, p["pre_ln_w"], p["pre_ln_b"], config.eps)
        b = x.shape[0]
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        sidx = jax.lax.axis_index("model")
        t_loc = t_pad // n_model
        x = jax.lax.dynamic_slice_in_dim(x, sidx * t_loc, t_loc, axis=1)

        def block(h, lp):
            # Attention: SP-region LN → AG(tokens) → col-parallel QKV →
            # head-parallel flash core → row-parallel out → RS(tokens).
            hh = vit.layer_norm(h, lp["ln1_w"], lp["ln1_b"], config.eps)
            hg = jax.lax.all_gather(hh, "model", axis=1, tiled=True)
            qkv = _dot_q(hg, lp["qkv_w"], w8a8)
            qkv = (qkv + lp["qkv_b"]).astype(h.dtype)  # [B, T_pad, nh_loc*3*hd]
            if attention_impl == "flash":
                from ..ops.attention import packed_fused_attention

                ctx = packed_fused_attention(
                    qkv, num_heads=nh_loc, head_dim=hd, packing="per_head",
                    true_seq_len=t if t_pad != t else None,
                )
            else:
                ctx = _masked_xla_attention(qkv, b, t_pad, nh_loc, hd, t)
            partial = _dot_q(ctx, lp["out_w"], w8a8,
                             heads=(nh_loc, hd))  # fp32 [B, T_pad, D]
            attn = jax.lax.psum_scatter(partial, "model",
                                        scatter_dimension=1, tiled=True)
            h = h + (attn + lp["out_b"]).astype(h.dtype)

            # MLP: SP-region LN → AG → col-parallel fc1+GELU →
            # row-parallel fc2 → RS.
            hh = vit.layer_norm(h, lp["ln2_w"], lp["ln2_b"], config.eps)
            hg = jax.lax.all_gather(hh, "model", axis=1, tiled=True)
            hid = _dot_q(hg, lp["fc1_w"], w8a8)
            hid = vit.gelu_erf((hid + lp["fc1_b"]).astype(h.dtype))
            partial = _dot_q(hid, lp["fc2_w"], w8a8, tail_shards=n_model)
            mlp = jax.lax.psum_scatter(partial, "model",
                                       scatter_dimension=1, tiled=True)
            return h + (mlp + lp["fc2_b"]).astype(h.dtype), None

        x, _ = jax.lax.scan(block, x, p["layers"])
        x = vit.layer_norm(x, p["final_ln_w"], p["final_ln_b"], config.eps)
        full = jax.lax.all_gather(x, "model", axis=1, tiled=True)[:, :t]
        logits = vit.classifier_logits(full.astype(jnp.float32), p, config,
                                       compute_dtype)
        if return_logits:
            return logits
        return jax.nn.softmax(logits, axis=-1)

    def build():
        return jax.jit(jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P("data"), pspecs),
            out_specs=P("data"),
            check_vma=False,
        ))

    return _cached_program(cache_key, build)(images, params)


# ---------------------------------------------------------------------------
# Data-parallel inference (pjit/GSPMD — params replicated)
# ---------------------------------------------------------------------------


def dp_forward_fn(config: ViTConfig, mesh: Mesh, *, compute_dtype=jnp.bfloat16,
                  attention_impl: str = "xla"):
    """Compiled data-parallel forward: batch over the full mesh, params
    replicated. The throughput config for BASELINE's images/sec scaling."""
    kernels = vit.resolve_kernels(attention_impl)
    data_sharding = NamedSharding(mesh, P(("data", "model")))

    @functools.partial(jax.jit, out_shardings=data_sharding)
    def fwd(images, params):
        images = jax.lax.with_sharding_constraint(images, data_sharding)
        return vit.forward(
            images, params, config, compute_dtype=compute_dtype, kernels=kernels
        )

    return fwd


# ---------------------------------------------------------------------------
# GSPMD training step (capability beyond the reference; exercises grads +
# collectives for the multi-chip dry run)
# ---------------------------------------------------------------------------


def make_train_step(config: ViTConfig, mesh: Mesh, *, lr: float = 1e-3,
                    compute_dtype=jnp.float32, optimizer: str = "sgd",
                    weight_decay: float = 0.05, attention_impl: str = "xla",
                    grad_accum: int = 1, scan_unroll: int = 1,
                    grad_clip_norm: float | None = None,
                    label_smoothing: float = 0.0,
                    tuning: dict | None = None):
    """Cross-entropy training step, jit over the mesh: batch sharded over
    "data", weights sharded over "model" (GSPMD inserts the collectives).

    ``grad_accum=A`` splits the step's batch into A microbatches inside the
    compiled program (``lax.scan``): activation memory drops to one
    microbatch while grads accumulate in fp32, so effective batch scales
    past what fits in HBM at once. The update is mathematically the
    full-batch gradient (mean of equal-size microbatch means).

    ``optimizer``: "sgd" (stateless; step(params, images, labels)) or
    "adamw" (optax; returns (init_fn, step_fn) where step takes and returns
    (params, opt_state)). ``attention_impl="flash"`` uses the fused Pallas
    attention in BOTH directions (custom-VJP forward + fused backward
    kernel). ``attention_impl="fused"`` goes further: every encoder layer
    runs as ONE fused Pallas kernel in BOTH directions
    (ops/fused_block.fused_encoder_layer_trainable — rematerializing
    backward, x is the only residual per layer), falling back to the flash
    path when the config's weights exceed the trainable VMEM gate.
    ``grad_clip_norm`` clips gradients by global L2 norm before the update
    (optax.clip_by_global_norm semantics on both optimizers).
    """
    if attention_impl in ("flash", "fused"):
        from ..ops.attention import packed_fused_attention_trainable

        kernels = vit.resolve_kernels("xla")
        # Device-measured launch knobs (perf/autotune cache): attention_ipc
        # tunes the forward kernel's grid cell like the inference engine's
        # lookup does; attention_bwd_ipc is the backward kernel's own knob
        # (its working set is ~2.3x, so the winners differ).
        tuning = tuning or {}
        _fwd_ipc = (int(tuning["attention_ipc"])
                    if tuning.get("attention_ipc") else None)
        _bwd_ipc = (int(tuning["attention_bwd_ipc"])
                    if tuning.get("attention_bwd_ipc") else None)
        kernels["attention_packed"] = (
            lambda qkv, cfg: packed_fused_attention_trainable(
                qkv, cfg.num_heads, cfg.head_dim, _fwd_ipc, _bwd_ipc
            )
        )
        if attention_impl == "fused":
            from ..ops import fused_block

            if fused_block.supports_trainable(
                config, dtype_bytes=jnp.dtype(compute_dtype).itemsize
            ):
                # fp32 master weights are safe here: the kernel wrappers cast
                # the four matmul weights to the ACTIVATION dtype at the
                # operand level (_weight_specs_operands), so bf16 compute
                # keeps bf16 weights VMEM-resident while grads accumulate
                # fp32 and flow back to the fp32 masters at full precision.
                kernels["encoder_block"] = (
                    fused_block.fused_encoder_layer_trainable
                )
    else:
        kernels = vit.resolve_kernels(attention_impl)
    if scan_unroll > 1:
        # Unrolling the encoder layer loop trades program size for dodging
        # grad-through-while; see models/vit.encoder.
        kernels["encoder_scan_unroll"] = scan_unroll

    if not 0.0 <= label_smoothing < 1.0:
        raise ValueError(f"label_smoothing must be in [0, 1), got "
                         f"{label_smoothing}")
    clip_tx = None
    if grad_clip_norm is not None:
        if not grad_clip_norm > 0.0:
            # 0 silently freezes training; negative flips gradient signs.
            raise ValueError(f"grad_clip_norm must be > 0, got "
                             f"{grad_clip_norm}")
        import optax

        # ONE clipping implementation for both optimizers (the transform is
        # stateless, so the sgd path can apply it directly).
        clip_tx = optax.clip_by_global_norm(grad_clip_norm)

    def loss_fn(params, images, labels):
        logits = vit.forward(
            images, params, config, compute_dtype=compute_dtype,
            return_logits=True, kernels=kernels,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        if labels.ndim == 2:
            # Soft labels [B, C] (Mixup/CutMix from augment.mixup_cutmix):
            # CE against the given distribution. The branch is on a static
            # rank, so int- and soft-label callers just get two jit caches.
            nll = -jnp.mean(jnp.sum(labels.astype(logp.dtype) * logp, -1))
        else:
            nll = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=-1))
        if label_smoothing:
            # Uniform smoothing: (1-eps)*CE(y) + eps*CE(uniform) — the
            # standard ViT/DeiT training recipe's regularizer (composes
            # with soft labels exactly as timm's SoftTargetCrossEntropy
            # does when mixup already folded smoothing: keep one of them).
            uniform = -jnp.mean(logp)
            nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
        return nll

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def value_and_grads(params, images, labels):
        if grad_accum == 1:
            return jax.value_and_grad(loss_fn)(params, images, labels)
        b = images.shape[0]
        if b % grad_accum:
            raise ValueError(
                f"batch {b} not divisible by grad_accum={grad_accum}"
            )
        mb = b // grad_accum
        mb_images = images.reshape((grad_accum, mb) + images.shape[1:])
        mb_labels = labels.reshape((grad_accum, mb) + labels.shape[1:])

        def body(carry, xs):
            loss_acc, grads_acc = carry
            imgs, labs = xs
            loss, grads = jax.value_and_grad(loss_fn)(params, imgs, labs)
            grads_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32), grads_acc, grads
            )
            return (loss_acc + loss, grads_acc), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(jnp.shape(p), jnp.float32), params
        )
        (loss_sum, grads_sum), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros),
            (mb_images, mb_labels),
        )
        inv = 1.0 / grad_accum
        grads = jax.tree.map(lambda g: g * inv, grads_sum)
        return loss_sum * inv, grads

    if optimizer == "sgd":

        @jax.jit
        def step(params, images, labels):
            loss, grads = value_and_grads(params, images, labels)
            if clip_tx is not None:
                grads, _ = clip_tx.update(grads, clip_tx.init(grads))
            new_params = jax.tree.map(
                lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype)
                if jnp.issubdtype(p.dtype, jnp.floating)
                else p,
                params,
                grads,
            )
            return new_params, loss

        return step

    if optimizer != "adamw":
        raise ValueError(f"unknown optimizer {optimizer!r}")

    import optax

    tx = optax.adamw(lr, weight_decay=weight_decay)
    if clip_tx is not None:
        tx = optax.chain(clip_tx, tx)

    def init_fn(params):
        # The optimizer moments must be sharded EXACTLY like their params —
        # for ViT-G (1.84B) fp32 mu+nu are ~15 GB and exceed one chip's HBM,
        # and XLA's propagation through a bare jit(tx.init) is free to (and
        # measured to) replicate them. Match each state leaf to its param by
        # path suffix (mu["layers"]["qkv_w"] <- params["layers"]["qkv_w"])
        # and pin it with out_shardings; unmatched leaves (e.g. the scalar
        # step count) replicate over the mesh.
        from jax.tree_util import tree_flatten_with_path, tree_map_with_path

        flat_params, _ = tree_flatten_with_path(params)
        by_path = {}
        for path, p in flat_params:
            if isinstance(p, jax.Array):
                by_path[tuple(str(k) for k in path)] = (p.sharding, p.shape)
        replicated = NamedSharding(mesh, P())

        def pick(path, leaf):
            keys = tuple(str(k) for k in path)
            for i in range(len(keys)):
                hit = by_path.get(keys[i:])
                if hit is not None and hit[1] == leaf.shape:
                    return hit[0]
            return replicated

        state_shapes = jax.eval_shape(tx.init, params)
        shardings = tree_map_with_path(pick, state_shapes)
        return jax.jit(tx.init, out_shardings=shardings)(params)

    @jax.jit
    def step(params, opt_state, images, labels):
        loss, grads = value_and_grads(params, images, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step


def gspmd_param_specs(params: Params, config: ViTConfig) -> Params:
    """Sharding specs for the single-chip stacked layout under GSPMD: shard
    the big per-layer matrices over "model", replicate the rest."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["layers"] = dict(specs["layers"])
    lp = params["layers"]
    specs["layers"]["qkv_w"] = _weight_spec(lp["qkv_w"], P(None, None, "model"))
    specs["layers"]["out_w"] = _weight_spec(lp["out_w"], P(None, "model", None))
    specs["layers"]["fc1_w"] = _weight_spec(lp["fc1_w"], P(None, None, "model"))
    specs["layers"]["fc2_w"] = _weight_spec(lp["fc2_w"], P(None, "model", None))
    return specs


def shard_params_gspmd(params: Params, mesh: Mesh, config: ViTConfig) -> Params:
    specs = gspmd_param_specs(params, config)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
