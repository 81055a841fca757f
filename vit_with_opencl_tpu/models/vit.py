"""TPU-native ViT forward pass (JAX/XLA).

This is the accelerated backend — the role the reference's OpenCL host
orchestration + 8 kernels play (reference: ViT_opencl.c:794-986, §2.2 of
SURVEY.md) — redesigned for XLA rather than transliterated:

  * patch-embedding conv → patchify reshape + one MXU matmul
    (replaces ``conv2d_kernel`` + ``postprocess``, conv2d.cl:1-80);
  * the 12 encoder layers → ``lax.scan`` over stacked layer weights
    (replaces the unrolled ping-pong orchestration, ViT_opencl.c:938-948);
  * QKV projection → a single fused ``[D, 3D]`` matmul
    (replaces the ``QKV`` kernel, multihead.cl:3-63);
  * attention core → batched einsum or a fused Pallas flash kernel
    (replaces ``QKV_TO_SCOREV``, multihead.cl:65-138, without its seq<=256 cap);
  * linear(+GELU) → XLA-fused matmul epilogues or a Pallas GEMM
    (replaces ``ll.cl``);
  * LayerNorm / residual / softmax → XLA fusions (replace layer_norm.cl,
    miniSoftMax.cl).

Numerics: bf16 storage/matmul inputs with fp32 accumulation
(``preferred_element_type``), LN statistics and softmax in fp32 — targeting
max abs err < 1e-3 vs the fp32 golden model. A ``param_dtype=float32`` mode
exists for tight parity testing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter conversion: named numpy dict (io layer) → stacked device pytree
# ---------------------------------------------------------------------------


def stack_params(
    named: Dict[str, np.ndarray],
    config: ViTConfig,
    param_dtype: jnp.dtype = jnp.bfloat16,
) -> Params:
    """{torchvision-style name: array} → stacked pytree for ``lax.scan``.

    Matmul weights are pre-transposed to right-multiply layout ``[in, out]``
    (the reference stores PyTorch ``[out, in]`` and reads it transposed inside
    its GEMM — ll.cl:47); LN parameters and biases stay fp32 — they feed fp32
    epilogues and cost nothing.

    The entire pytree is built on the HOST (numpy, ml_dtypes bf16) — callers
    transfer it with one ``jax.device_put``. Eager per-tensor ``jnp.asarray``
    would dispatch ~150 tiny device programs, which is pathological on
    tunneled runtimes (observed: minutes of setup vs seconds).
    """
    import ml_dtypes

    f32 = np.float32
    np_param_dtype = (
        ml_dtypes.bfloat16 if jnp.dtype(param_dtype) == jnp.bfloat16
        else np.dtype(jnp.dtype(param_dtype).name)
    )

    def w(name, dtype=None):
        return np.asarray(named[name], dtype=dtype if dtype is not None
                          else np_param_dtype)

    d = config.embed_dim
    prefix_tokens = [np.asarray(named["class_token"], np.float32).reshape(1, d)]
    if config.num_prefix_tokens > 1:
        prefix_tokens.append(np.asarray(named["dist_token"], np.float32).reshape(1, d))
    params: Params = {
        "prefix_tokens": np.concatenate(prefix_tokens, 0).astype(f32),
        # conv [D, C, P, P] → [C*P*P, D] so patchify output right-multiplies.
        "patch_w": np.ascontiguousarray(
            np.asarray(named["conv_proj_weight"], np.float32).reshape(d, -1).T
        ).astype(np_param_dtype),
        "patch_b": w("conv_proj_bias", f32),
        "pos_emb": w("encoder_pos_embedding", f32),
        "final_ln_w": w("encoder_ln_weight", f32),
        "final_ln_b": w("encoder_ln_bias", f32),
    }
    if config.pre_norm:
        params["pre_ln_w"] = w("encoder_pre_ln_weight", f32)
        params["pre_ln_b"] = w("encoder_pre_ln_bias", f32)
    if config.head_type != "none":
        params["head_w"] = np.ascontiguousarray(
            np.asarray(named["heads_head_weight"], np.float32).T
        ).astype(np_param_dtype)
        params["head_b"] = w("heads_head_bias", f32)
    if config.head_type == "cls+dist":
        params["head_dist_w"] = np.ascontiguousarray(
            np.asarray(named["heads_head_dist_weight"], np.float32).T
        ).astype(np_param_dtype)
        params["head_dist_b"] = w("heads_head_dist_bias", f32)

    def stack(key, transpose=False, dtype=None):
        dtype = dtype if dtype is not None else np_param_dtype
        arrs = []
        for layer in range(config.depth):
            a = np.asarray(
                named[f"encoder_layers_encoder_layer_{layer}_{key}"], np.float32
            )
            arrs.append(a.T if transpose else a)
        return np.stack(arrs).astype(dtype)

    params["layers"] = {
        "ln1_w": stack("ln_1_weight", dtype=f32),
        "ln1_b": stack("ln_1_bias", dtype=f32),
        "qkv_w": stack("self_attention_in_proj_weight", transpose=True),  # [L, D, 3D]
        "qkv_b": stack("self_attention_in_proj_bias", dtype=f32),  # [L, 3D]
        "out_w": stack("self_attention_out_proj_weight", transpose=True),  # [L, D, D]
        "out_b": stack("self_attention_out_proj_bias", dtype=f32),
        "ln2_w": stack("ln_2_weight", dtype=f32),
        "ln2_b": stack("ln_2_bias", dtype=f32),
        "fc1_w": stack("mlp_0_weight", transpose=True),  # [L, D, H]
        "fc1_b": stack("mlp_0_bias", dtype=f32),
        "fc2_w": stack("mlp_3_weight", transpose=True),  # [L, H, D]
        "fc2_b": stack("mlp_3_bias", dtype=f32),
    }
    return params


def unstack_params(params: Params, config: ViTConfig) -> Dict[str, np.ndarray]:
    """Stacked pytree → {reference tensor name: fp32 array} (inverse of
    :func:`stack_params`).

    Undoes the right-multiply pre-transposition and the prefix-token
    packing, restoring the PyTorch ``[out, in]`` layout the reference's
    weight files store (io/binfmt.weight_shapes). This is what lets a
    model trained here be written back as a reference-format checkpoint
    (``io.export.export_weights``) and re-verified through the reference
    comparator path.
    """
    f32 = np.float32
    d = config.embed_dim

    def h(x):  # host fp32 view
        return np.asarray(x, f32)

    prefix = h(params["prefix_tokens"]).reshape(config.num_prefix_tokens, d)
    named: Dict[str, np.ndarray] = {
        "class_token": prefix[0].reshape(d),
        "conv_proj_weight": np.ascontiguousarray(h(params["patch_w"]).T)
        .reshape(d, config.in_chans, config.patch_size, config.patch_size),
        "conv_proj_bias": h(params["patch_b"]),
        "encoder_pos_embedding": h(params["pos_emb"]),
        "encoder_ln_weight": h(params["final_ln_w"]),
        "encoder_ln_bias": h(params["final_ln_b"]),
    }
    if config.num_prefix_tokens > 1:
        named["dist_token"] = prefix[1].reshape(d)
    if config.pre_norm:
        named["encoder_pre_ln_weight"] = h(params["pre_ln_w"])
        named["encoder_pre_ln_bias"] = h(params["pre_ln_b"])
    if config.head_type != "none":
        named["heads_head_weight"] = np.ascontiguousarray(
            h(params["head_w"]).T)
        named["heads_head_bias"] = h(params["head_b"])
    if config.head_type == "cls+dist":
        named["heads_head_dist_weight"] = np.ascontiguousarray(
            h(params["head_dist_w"]).T)
        named["heads_head_dist_bias"] = h(params["head_dist_b"])

    lp = params["layers"]
    key_map = [
        ("ln_1_weight", "ln1_w", False),
        ("ln_1_bias", "ln1_b", False),
        ("self_attention_in_proj_weight", "qkv_w", True),
        ("self_attention_in_proj_bias", "qkv_b", False),
        ("self_attention_out_proj_weight", "out_w", True),
        ("self_attention_out_proj_bias", "out_b", False),
        ("ln_2_weight", "ln2_w", False),
        ("ln_2_bias", "ln2_b", False),
        ("mlp_0_weight", "fc1_w", True),
        ("mlp_0_bias", "fc1_b", False),
        ("mlp_3_weight", "fc2_w", True),
        ("mlp_3_bias", "fc2_b", False),
    ]
    for layer in range(config.depth):
        pfx = f"encoder_layers_encoder_layer_{layer}_"
        for ref_key, stk_key, transpose in key_map:
            a = h(lp[stk_key][layer])
            named[pfx + ref_key] = (
                np.ascontiguousarray(a.T) if transpose else a
            )
    return named


def random_stacked_params(
    config: ViTConfig,
    key: jax.Array,
    param_dtype: jnp.dtype = jnp.bfloat16,
    scale: float = 0.02,
) -> Params:
    """Random stacked params generated directly on device.

    For benchmarks and compile checks: avoids materializing ~90M host floats
    and pushing them through a (possibly tunneled) H2D path.
    """
    f32 = jnp.float32
    d, h, L = config.embed_dim, config.hidden_dim, config.depth
    keys = iter(jax.random.split(key, 32))

    def rnd(shape, dtype=param_dtype, s=scale):
        return (jax.random.normal(next(keys), shape, f32) * s).astype(dtype)

    params: Params = {
        "prefix_tokens": rnd((config.num_prefix_tokens, d), f32),
        "patch_w": rnd((config.in_chans * config.patch_size**2, d)),
        "patch_b": rnd((d,), f32),
        "pos_emb": rnd((config.num_tokens, d), f32),
        "final_ln_w": jnp.ones((d,), f32),
        "final_ln_b": jnp.zeros((d,), f32),
    }
    if config.pre_norm:
        params["pre_ln_w"] = jnp.ones((d,), f32)
        params["pre_ln_b"] = jnp.zeros((d,), f32)
    if config.head_type != "none":
        params["head_w"] = rnd((d, config.num_classes))
        params["head_b"] = rnd((config.num_classes,), f32)
    if config.head_type == "cls+dist":
        params["head_dist_w"] = rnd((d, config.num_classes))
        params["head_dist_b"] = rnd((config.num_classes,), f32)
    params["layers"] = {
        "ln1_w": jnp.ones((L, d), f32),
        "ln1_b": jnp.zeros((L, d), f32),
        "qkv_w": rnd((L, d, 3 * d)),
        "qkv_b": rnd((L, 3 * d), f32),
        "out_w": rnd((L, d, d)),
        "out_b": rnd((L, d), f32),
        "ln2_w": jnp.ones((L, d), f32),
        "ln2_b": jnp.zeros((L, d), f32),
        "fc1_w": rnd((L, d, h)),
        "fc1_b": rnd((L, h), f32),
        "fc2_w": rnd((L, h, d)),
        "fc2_b": rnd((L, d), f32),
    }
    return params


def cheap_stacked_params(
    config: ViTConfig,
    param_dtype: jnp.dtype = jnp.bfloat16,
    scale: float = 0.02,
) -> Params:
    """Deterministic non-random stacked params for benchmarking.

    ``random_stacked_params`` is the right tool for correctness work, but a
    threefry program over ~90M elements is brutal to compile on some
    backends (the tunneled runtime times out). Benchmarks only need varied,
    well-scaled values, which a cheap iota hash provides at negligible
    compile cost.
    """
    f32 = jnp.float32
    d, h, L = config.embed_dim, config.hidden_dim, config.depth
    salt = [0]

    def fill(shape, dtype=param_dtype, s=scale):
        salt[0] += 1
        n = int(np.prod(shape))
        i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        v = ((i * 1103515245 + salt[0] * 12345) % 2039).astype(f32)
        v = (v / 2039.0 - 0.5) * (2.0 * s)
        return v.reshape(shape).astype(dtype)

    params: Params = {
        "prefix_tokens": fill((config.num_prefix_tokens, d), f32),
        "patch_w": fill((config.in_chans * config.patch_size**2, d)),
        "patch_b": fill((d,), f32),
        "pos_emb": fill((config.num_tokens, d), f32),
        "final_ln_w": jnp.ones((d,), f32),
        "final_ln_b": jnp.zeros((d,), f32),
    }
    if config.pre_norm:
        params["pre_ln_w"] = jnp.ones((d,), f32)
        params["pre_ln_b"] = jnp.zeros((d,), f32)
    if config.head_type != "none":
        params["head_w"] = fill((d, config.num_classes))
        params["head_b"] = fill((config.num_classes,), f32)
    if config.head_type == "cls+dist":
        params["head_dist_w"] = fill((d, config.num_classes))
        params["head_dist_b"] = fill((config.num_classes,), f32)
    params["layers"] = {
        "ln1_w": jnp.ones((L, d), f32),
        "ln1_b": jnp.zeros((L, d), f32),
        "qkv_w": fill((L, d, 3 * d)),
        "qkv_b": fill((L, 3 * d), f32),
        "out_w": fill((L, d, d)),
        "out_b": fill((L, d), f32),
        "ln2_w": jnp.ones((L, d), f32),
        "ln2_b": jnp.zeros((L, d), f32),
        "fc1_w": fill((L, d, h)),
        "fc1_b": fill((L, h), f32),
        "fc2_w": fill((L, h, d)),
        "fc2_b": fill((L, d), f32),
    }
    return params


def init_params(
    config: ViTConfig,
    seed: int = 0,
    param_dtype: jnp.dtype = jnp.float32,
) -> Params:
    """Trainable from-scratch initialization (stacked layout).

    ViT-paper scheme: truncated-normal(0.02) matmul weights and positional
    embeddings, zero biases and class token, unit LNs, zero-init classifier
    head (standard for stable fine-tune/scratch starts). Built entirely on
    the HOST with numpy — callers transfer with one ``jax.device_put``
    (eager per-tensor transfers are pathological on tunneled runtimes) —
    and fp32 by default: training keeps fp32 masters and casts to the
    compute dtype per step.
    """
    import ml_dtypes

    rng = np.random.default_rng(seed)
    f32 = np.float32
    npdt = (ml_dtypes.bfloat16 if jnp.dtype(param_dtype) == jnp.bfloat16
            else np.dtype(jnp.dtype(param_dtype).name))
    d, h, L = config.embed_dim, config.hidden_dim, config.depth

    def tnorm(shape, std=0.02, dtype=npdt):
        a = rng.standard_normal(shape, f32)
        np.clip(a, -2.0, 2.0, out=a)  # truncation at 2 sigma
        return (a * std).astype(dtype)

    params: Params = {
        "prefix_tokens": np.zeros((config.num_prefix_tokens, d), f32),
        "patch_w": tnorm((config.in_chans * config.patch_size**2, d)),
        "patch_b": np.zeros((d,), f32),
        "pos_emb": tnorm((config.num_tokens, d), dtype=f32),
        "final_ln_w": np.ones((d,), f32),
        "final_ln_b": np.zeros((d,), f32),
    }
    if config.pre_norm:
        params["pre_ln_w"] = np.ones((d,), f32)
        params["pre_ln_b"] = np.zeros((d,), f32)
    if config.head_type != "none":
        params["head_w"] = np.zeros((d, config.num_classes), npdt)
        params["head_b"] = np.zeros((config.num_classes,), f32)
    if config.head_type == "cls+dist":
        params["head_dist_w"] = np.zeros((d, config.num_classes), npdt)
        params["head_dist_b"] = np.zeros((config.num_classes,), f32)
    params["layers"] = {
        "ln1_w": np.ones((L, d), f32),
        "ln1_b": np.zeros((L, d), f32),
        "qkv_w": tnorm((L, d, 3 * d)),
        "qkv_b": np.zeros((L, 3 * d), f32),
        "out_w": tnorm((L, d, d)),
        "out_b": np.zeros((L, d), f32),
        "ln2_w": np.ones((L, d), f32),
        "ln2_b": np.zeros((L, d), f32),
        "fc1_w": tnorm((L, d, h)),
        "fc1_b": np.zeros((L, h), f32),
        "fc2_w": tnorm((L, h, d)),
        "fc2_b": np.zeros((L, d), f32),
    }
    return params


# ---------------------------------------------------------------------------
# Ops (XLA path; Pallas variants live in ops/ and plug in via `kernels`)
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    """LN with fp32 statistics, var = E[x²]−E[x]² (golden semantics,
    reference: ViT_seq.c:120-142). Returns x's dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = mean_sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    return ((xf - mean) * inv * w + b).astype(x.dtype)


def gelu_erf(x: jax.Array) -> jax.Array:
    """Exact erf-GELU in fp32 (golden semantics, reference: ViT_seq.c:283-285)."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf * np.float32(1 / np.sqrt(2.0))))).astype(
        x.dtype
    )


def _gelu(x: jax.Array, config: ViTConfig) -> jax.Array:
    if config.gelu_approx == "tanh":
        return jax.nn.gelu(x, approximate=True)
    return gelu_erf(x)


def _matmul(x: jax.Array, w: Any, b: Optional[jax.Array]) -> jax.Array:
    """x @ w (+ b) with fp32 accumulation; result in x's dtype.

    Transparently supports int8 weight-only quantization (models/quant.py):
    a {"q": int8, "scale": f32} weight runs as a bf16 MXU matmul with the
    per-output-channel scale fused into the fp32 epilogue.
    """
    from . import quant

    return quant.matmul_q(x, w, b)


def xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, config: ViTConfig
) -> jax.Array:
    """Reference attention math as batched einsums ([B, H, T, hd] inputs).

    XLA fuses the softmax chain; scores materialize per (B, H) tile in HBM,
    which is fine at 197 tokens. The Pallas flash kernel (ops/attention.py)
    replaces this for long sequences and peak perf.
    """
    scale = np.float32(1.0 / np.sqrt(config.head_dim))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores * scale, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def _attention_block(
    x: jax.Array, lp: Params, config: ViTConfig, kernels: Dict[str, Any]
) -> jax.Array:
    """LN1 → fused QKV matmul → attention core → out-proj, batched [B, T, D].

    With a packed-attention kernel in the table, the QKV matmul output feeds
    the attention core directly in its packed [B, T, 3D] layout (no head-axis
    transposes materialized); otherwise the generic [B, H, T, hd] path runs.
    """
    b, t, d = x.shape
    nh, hd = config.num_heads, config.head_dim
    h = kernels["layer_norm"](x, lp["ln1_w"], lp["ln1_b"], config.eps)
    qkv = kernels["matmul"](h, lp["qkv_w"], lp["qkv_b"])  # [B, T, 3D]
    if "attention_packed" in kernels:
        ctx = kernels["attention_packed"](qkv, config)  # [B, T, D]
    else:
        qkv = qkv.reshape(b, t, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        ctx = kernels["attention"](qkv[0], qkv[1], qkv[2], config)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
    return kernels["matmul"](ctx, lp["out_w"], lp["out_b"])


def _mlp_block(
    x: jax.Array, lp: Params, config: ViTConfig, kernels: Dict[str, Any]
) -> jax.Array:
    h = kernels["layer_norm"](x, lp["ln2_w"], lp["ln2_b"], config.eps)
    h = kernels["matmul_gelu"](h, lp["fc1_w"], lp["fc1_b"], config)
    return kernels["matmul"](h, lp["fc2_w"], lp["fc2_b"])


def _default_kernels() -> Dict[str, Any]:
    return {
        "layer_norm": layer_norm,
        "matmul": _matmul,
        "matmul_gelu": lambda x, w, b, cfg: _gelu(_matmul(x, w, b), cfg),
        "attention": xla_attention,
    }


def resolve_kernels(attention_impl: str = "xla",
                    tuning: Optional[Dict[str, Any]] = None,
                    w8a8: bool = False,
                    heads: Optional[tuple] = None) -> Dict[str, Any]:
    """Kernel table for the forward pass.

    ``attention_impl``:
      * 'xla'   — einsum softmax chain (scores materialize; XLA fuses the rest)
      * 'flash' — Pallas fused attention: packed-layout kernel in the jit
        engine path plus the generic [B, H, T, hd] flash kernel for callers
        that already hold split heads (e.g. the tensor-parallel path).

    ``tuning``: optional knobs from the autotune cache (perf/autotune.lookup):
    ``attention_ipc`` / ``fused_block_ipc`` override the kernels' shipped
    images-per-cell heuristics; ``attention_ragged`` overrides the
    ragged-vs-padded block route; ``blockwise_block_q``/``blockwise_block_k``
    tune the long-sequence flash blocks — all with device-measured winners.
    """
    import functools as _ft

    tuning = tuning or {}
    kernels = _default_kernels()
    if attention_impl in ("flash", "fused_block"):
        from ..ops.attention import flash_attention, packed_fused_attention

        kernels["attention"] = flash_attention
        attn_kw = {}
        if tuning.get("attention_ipc"):
            attn_kw["images_per_cell"] = int(tuning["attention_ipc"])
        if tuning.get("attention_ragged") is not None:
            attn_kw["ragged"] = bool(tuning["attention_ragged"])
        if tuning.get("blockwise_block_q"):
            attn_kw["block_q"] = int(tuning["blockwise_block_q"])
        if tuning.get("blockwise_block_k"):
            attn_kw["block_k"] = int(tuning["blockwise_block_k"])
        kernels["attention_packed"] = (
            _ft.partial(packed_fused_attention, **attn_kw)
            if attn_kw else packed_fused_attention
        )
        # Small models also get the whole-layer fused kernel (gated by
        # fused_block.supports; a no-op for ViT-B-sized configs).
        kernels["_fused_block_if_supported"] = True
        if tuning.get("fused_block_ipc"):
            kernels["fused_block_ipc"] = int(tuning["fused_block_ipc"])
        if tuning.get("fused_stack_ipc"):
            # Separate knob: the whole-encoder stack kernel has its own
            # measured optimum (the per-layer winner would regress it).
            kernels["fused_stack_ipc"] = int(tuning["fused_stack_ipc"])
    elif attention_impl != "xla":
        raise ValueError(f"unknown attention_impl {attention_impl!r}")
    if w8a8:
        # Dynamic-int8 activations into the encoder's four big GEMMs: the
        # int8 MXU path runs ~1.8x the bf16 rate (scripts/probe_int8.py).
        # Requires int8 weight dicts (fp weights fall back per-matmul).
        # Embed/head/attention-core stay bf16 — together <8% of MACs, and
        # they anchor the accuracy budget.
        from . import quant

        mm = _ft.partial(quant.matmul_w8a8, heads=heads)
        kernels["matmul"] = mm
        kernels["matmul_gelu"] = lambda x, w, b, cfg: _gelu(mm(x, w, b), cfg)
        kernels["w8a8"] = True
    return kernels


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def patchify(images: jax.Array, config: ViTConfig) -> jax.Array:
    """[B, C, H, W] → [B, num_patches, C*P*P] with (ic, kh, kw) patch layout
    (matches the conv kernel flattening, reference: ViT_seq.c:46)."""
    b, c, _, _ = images.shape
    p, g = config.patch_size, config.grid_size
    x = images.reshape(b, c, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, g, g, C, P, P]
    return x.reshape(b, g * g, c * p * p)


def embed(images: jax.Array, params: Params, config: ViTConfig,
          compute_dtype: jnp.dtype) -> jax.Array:
    """Patch-embed + prefix tokens + positional embedding → [B, T, D].

    One MXU matmul plus an fp32 epilogue — the fused equivalent of the
    reference's ``conv2d_kernel`` + ``postprocess`` pair (conv2d.cl:1-80)."""
    from . import quant

    b = images.shape[0]
    patches = patchify(images, config).astype(compute_dtype)
    pw = params["patch_w"]
    if quant.is_quantized(pw):
        tok = jnp.dot(patches, pw["q"].astype(compute_dtype),
                      preferred_element_type=jnp.float32) * pw["scale"][0]
    else:
        tok = jnp.dot(patches, pw.astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    tok = tok + params["patch_b"]  # fp32 epilogue
    prefix = jnp.broadcast_to(
        params["prefix_tokens"][None], (b,) + params["prefix_tokens"].shape
    )
    x = jnp.concatenate([prefix, tok], axis=1) + params["pos_emb"]
    return x.astype(compute_dtype)


def encoder(x: jax.Array, params: Params, config: ViTConfig,
            kernels: Dict[str, Any]) -> jax.Array:
    """``lax.scan`` over the stacked per-layer weights (replaces the
    reference's 12 unrolled calls, ViT_seq.c:446-504)."""

    from . import quant

    quantized = quant.is_quantized(params["layers"]["qkv_w"])
    use_block = "encoder_block" in kernels and not quantized
    if kernels.get("_fused_block_if_supported") and not use_block:
        from ..ops import fused_block

        wdtype_bytes = (1 if quantized
                        else np.dtype(params["layers"]["qkv_w"].dtype).itemsize)
        gs = kernels.get("fused_group_size")
        w8a8 = bool(kernels.get("w8a8")) and quantized
        if (gs and gs > 1 and config.depth % gs == 0
                and fused_block.supports(config, dtype_bytes=wdtype_bytes)):
            # Explicit layer-group override: scan over groups of gs fused
            # layers — residual-stream HBM round trips paid once per group.
            return fused_block.fused_encoder_group(
                x, params["layers"], config, group_size=gs,
                images_per_cell=kernels.get("fused_block_ipc"), w8a8=w8a8,
            )
        if (not w8a8
                and fused_block.supports_stack(config, dtype_bytes=wdtype_bytes)):
            # Small models: the COMPLETE weight stack fits VMEM — run every
            # layer in one launch (no inter-layer HBM round trips at all).
            # W8A8 deliberately skips the stack kernel: its 12-layer
            # unrolled body plus per-row quantize code compiles for >10
            # minutes on the relay (vit_s, measured round 3), and the
            # stack-class models are VPU-bound where W8A8 regresses anyway
            # (Tiny: 27.9k w8a8-stack vs 31.4k bf16) — the per-layer fused
            # kernel below compiles in seconds.
            return fused_block.fused_encoder_stack(
                x, params["layers"], config,
                images_per_cell=kernels.get("fused_stack_ipc"), w8a8=False,
            )
        if fused_block.supports(config, dtype_bytes=wdtype_bytes):
            import functools as _ft

            kernels = dict(kernels)
            kernels["encoder_block"] = _ft.partial(
                fused_block.fused_encoder_layer,
                images_per_cell=kernels.get("fused_block_ipc"), w8a8=w8a8,
            )
            use_block = True
    if use_block:
        # Whole-layer fused kernel (small models): one launch per layer,
        # activations never leave VMEM between ops.
        def block(h, lp):
            return kernels["encoder_block"](h, lp, config), None
    else:
        def block(h, lp):
            h = h + _attention_block(h, lp, config, kernels)
            h = h + _mlp_block(h, lp, config, kernels)
            return h, None

    # encoder_scan_unroll replicates the body inside the loop (full unroll
    # when >= depth). The training path uses it to dodge a relay-compiler
    # limitation: grad through while(fused Pallas layer) crashes the tunnel's
    # compile helper at D>=768, while the loop-free unrolled program is fine.
    unroll = kernels.get("encoder_scan_unroll", 1)
    x, _ = jax.lax.scan(block, x, params["layers"], unroll=unroll)
    return x


def forward_features(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    kernels: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    """Tower forward → final-LN token features [B, T, D] (fp32)."""
    kernels = kernels or _default_kernels()
    x = embed(images, params, config, compute_dtype)
    if config.pre_norm:
        x = kernels["layer_norm"](x, params["pre_ln_w"], params["pre_ln_b"], config.eps)
    x = encoder(x, params, config, kernels)
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"], config.eps)
    return x.astype(jnp.float32)


def forward(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
    *,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    kernels: Optional[Dict[str, Any]] = None,
    return_logits: bool = False,
) -> jax.Array:
    """Full classifier forward → probabilities [B, num_classes] (fp32).

    Head applies to the CLS row only (reference: ViT_seq.c:509-513); the DeiT
    variant averages CLS-head and distill-head logits.
    """
    feats = forward_features(
        images, params, config, compute_dtype=compute_dtype, kernels=kernels
    )
    if config.head_type == "none":
        raise ValueError("head_type='none': use forward_features")
    logits = classifier_logits(feats, params, config, compute_dtype)
    if return_logits:
        return logits
    return jax.nn.softmax(logits, axis=-1)


def classifier_logits(
    feats: jax.Array,
    params: Params,
    config: ViTConfig,
    compute_dtype: jnp.dtype,
) -> jax.Array:
    """CLS-row classifier head (reference: ViT_seq.c:509-513), DeiT dual-head
    averaging, quantization-aware. Shared by the single-chip forward and the
    parallel (tp/sp/pp) paths so head semantics can't drift."""
    from . import quant

    def head(feat, w, bias):
        x = feat.astype(compute_dtype)
        if quant.is_quantized(w):
            out = jnp.dot(x, w["q"].astype(compute_dtype),
                          preferred_element_type=jnp.float32) * w["scale"][0]
        else:
            out = jnp.dot(x, w.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
        return out + bias

    logits = head(feats[:, 0], params["head_w"], params["head_b"])
    if config.head_type == "cls+dist":
        logits = 0.5 * (
            logits
            + head(feats[:, 1], params["head_dist_w"], params["head_dist_b"])
        )
    return logits
