"""Program-split training step: the encoder trains as a host loop over
small per-layer-group jit programs instead of one monolithic step.

Why this exists: compile-limited targets. The tunneled relay's compile
helper crashes (HTTP 500) on ViT-L/H fused-VJP training programs — 24–32
unrolled fused fwd+bwd layers exceed what it survives even with the
scan-unroll dodge — and the same knob is useful on any target where one
giant program blows a compile-time or program-size budget. Splitting at
layer-group boundaries keeps every compiled program ViT-B-sized while the
math stays EXACTLY the monolithic step's:

  stem     images → x0                       (embed + optional pre-LN)
  grp_fwd  (x, layers, g) → (x_out, xs)      G fused layers; per-layer
                                             inputs xs saved for backward
  head     (xL, rest, labels) → loss, dxL, rest-grads
  grp_bwd  (xs, layers, g, dy, acc) → (dx, acc')   G fused backwards,
                                             grads scattered into the
                                             stacked fp32 accumulator
  stem_bwd (images, rest, dx0) → rest-grads  (embed recompute, cheap)
  update   SGD over all grads (donated buffers)

Five compiled programs total, each REUSED for every group via a traced
group index (dynamic_slice on the stacked layer weights) — the host loop
enqueues 2·depth/G + 3 async dispatches per step; no per-group recompiles,
no eager per-tensor ops. Activation memory is depth × [B, T, D] (the same
per-layer residual the monolithic fused path saves inside its scan).

FLOPs match the monolithic fused step exactly: forward once, backward via
the rematerializing fused kernels (ops/fused_block.fused_encoder_layer_bwd)
— the group backward consumes the saved per-layer inputs, it never replays
the group forward.

Reference context: the reference trains nothing (its weights arrive
pre-trained, SURVEY §2.4); this is beyond-reference capability sized by the
repo's own ViT-G/H training story (VERDICT r3 items 4-5).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ViTConfig
from ..models import vit

Params = Dict[str, Any]


def _loss_from_logits(logits, labels, label_smoothing: float):
    """Same semantics as spmd.make_train_step's loss tail (int or soft
    [B, C] labels, uniform smoothing)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if labels.ndim == 2:
        nll = -jnp.mean(jnp.sum(labels.astype(logp.dtype) * logp, -1))
    else:
        nll = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
    if label_smoothing:
        uniform = -jnp.mean(logp)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
    return nll


def _slice_layer(layers, idx):
    """Layer ``idx`` of the stacked tree (traced index → one program)."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False),
        layers)


def make_split_train_step(
    config: ViTConfig,
    *,
    lr: float = 1e-3,
    compute_dtype=jnp.bfloat16,
    layers_per_program: int = 1,
    label_smoothing: float = 0.0,
    grad_clip_norm: Optional[float] = None,
    images_per_cell: Optional[int] = None,
    backward: str = "fused",
    tuning: Optional[dict] = None,
):
    """Build the host-loop step. Returns ``step(params, images, labels) →
    (new_params, loss)`` — same contract as spmd.make_train_step's SGD mode;
    ``params`` is the stacked tree (vit.stack_params layout; fp32 masters
    or bf16 for memory-bound giants — SGD updates in the param dtype).

    ``layers_per_program`` (G): layers chained per compiled program.
    G=1 → one-layer programs (the smallest possible compile units);
    G=4 → quarter-depth programs (fewer dispatches, still far under the
    monolith's size). Must divide ``config.depth``.

    ``backward``: 'fused' routes each layer through the rematerializing
    fused-kernel VJP (ops/fused_block); 'flash' runs the per-op layer with
    Pallas flash attention and differentiates it per group via jax.vjp —
    the only option at widths the fused trainable kernel cannot hold in
    VMEM (ViT-G: 76.7 MB/layer weights), and the same remat economics
    (the group backward replays its layers' forward from the saved
    per-layer inputs).
    """
    from ..ops import fused_block

    depth = config.depth
    gsz = int(layers_per_program)
    if gsz < 1 or depth % gsz:
        raise ValueError(
            f"layers_per_program={gsz} must divide depth={depth}")
    n_groups = depth // gsz
    if backward not in ("fused", "fused_staged", "flash"):
        raise ValueError(f"backward must be 'fused', 'fused_staged' or "
                         f"'flash', got {backward!r}")
    if backward == "fused_staged" and gsz != 1:
        raise ValueError("backward='fused_staged' jits each backward stage "
                         "as its own program; layers_per_program must be 1")
    if backward.startswith("fused") and not fused_block.supports_trainable(
            config, dtype_bytes=jnp.dtype(compute_dtype).itemsize):
        raise ValueError(
            f"{config.name}: fused trainable layer unsupported at this "
            "width; use backward='flash'")
    if images_per_cell is None and (tuning or {}).get("fused_block_ipc"):
        # The fused route's cell width shares the inference kernel's knob.
        images_per_cell = int(tuning["fused_block_ipc"])
    ipc = images_per_cell or 1
    if grad_clip_norm is not None and not grad_clip_norm > 0.0:
        raise ValueError(f"grad_clip_norm must be > 0, got {grad_clip_norm}")

    def _stem(images, rest):
        x = vit.embed(images, rest, config, compute_dtype)
        if config.pre_norm:
            x = vit.layer_norm(x, rest["pre_ln_w"], rest["pre_ln_b"],
                               config.eps)
        return x

    def _head_loss(x_last, rest, labels):
        feats = vit.layer_norm(x_last, rest["final_ln_w"],
                               rest["final_ln_b"], config.eps)
        logits = vit.classifier_logits(feats.astype(jnp.float32), rest,
                                       config, compute_dtype)
        return _loss_from_logits(logits, labels, label_smoothing)

    @jax.jit
    def stem_fwd(images, rest):
        return _stem(images, rest)

    if backward == "flash":
        from ..ops.attention import packed_fused_attention_trainable

        # Per-op layer with the TRAINABLE packed flash kernel (custom VJP)
        # — same wiring as spmd.make_train_step(attention_impl='flash'),
        # including its autotune launch knobs.
        _tun = tuning or {}
        _fwd_ipc = (int(_tun["attention_ipc"])
                    if _tun.get("attention_ipc") else None)
        _bwd_ipc = (int(_tun["attention_bwd_ipc"])
                    if _tun.get("attention_bwd_ipc") else None)
        flash_kernels = vit.resolve_kernels("xla")
        flash_kernels["attention_packed"] = (
            lambda qkv, cfg: packed_fused_attention_trainable(
                qkv, cfg.num_heads, cfg.head_dim, _fwd_ipc, _bwd_ipc))

        def _layer_fn(x, lp):
            x = x + vit._attention_block(x, lp, config, flash_kernels)
            return x + vit._mlp_block(x, lp, config, flash_kernels)
    else:
        def _layer_fn(x, lp):
            return fused_block.fused_encoder_layer(
                x, lp, config, images_per_cell=ipc)

    @jax.jit
    def grp_fwd(x, layers, g):
        xs = []
        for i in range(gsz):
            xs.append(x)
            lp = _slice_layer(layers, g * gsz + i)
            x = _layer_fn(x, lp)
        return x, jnp.stack(xs)

    @jax.jit
    def head_fwd_bwd(x_last, rest, labels):
        (loss, (dx, drest)) = jax.value_and_grad(
            _head_loss, argnums=(0, 1))(x_last, rest, labels)
        return loss, dx, drest

    @functools.partial(jax.jit, donate_argnums=(4,))
    def grp_bwd(xs, layers, g, dy, acc):
        for i in reversed(range(gsz)):
            idx = g * gsz + i
            lp = _slice_layer(layers, idx)
            if backward == "flash":
                _, vjp = jax.vjp(_layer_fn, xs[i], lp)
                dy, dlp = vjp(dy.astype(xs.dtype))
            else:
                dy, dlp = fused_block.fused_encoder_layer_bwd(
                    xs[i], lp, dy, config, images_per_cell=ipc)
            acc = jax.tree.map(
                lambda a, d: jax.lax.dynamic_update_index_in_dim(
                    a, d.astype(a.dtype), idx, 0),
                acc, dlp)
        return dy, acc

    # --- staged fused backward: one jit per Pallas stage -----------------
    # The relay's compile helper crashes on the COMBINED per-layer fused
    # backward at D>=1024 while every stage compiles standalone
    # (scripts/probe_fused_bwd.py round 4); these programs each hold
    # exactly one Pallas kernel. The layer slice runs as its OWN tiny XLA
    # program: a dynamic_index_in_dim feeding Pallas operands inside the
    # same program is itself a helper-crash trigger at D>=1024 (probed:
    # identical kernels compile with concrete operands and 500 with
    # sliced ones), and concrete buffers are what the probes validated.
    mlp_chunks = (fused_block._pick_mlp_chunks(
        config.embed_dim, config.hidden_dim,
        jnp.dtype(compute_dtype).itemsize)
        if backward == "fused_staged" else None)

    @jax.jit
    def slice_layer(layers, g):
        return _slice_layer(layers, g)

    @jax.jit
    def bwd_x2(x, lp):
        return fused_block.fused_bwd_stage_x2(
            x, lp, config, images_per_cell=ipc)

    @jax.jit
    def bwd_mlp_mono(x2, dy, lp):
        return fused_block.fused_bwd_stage_mlp_mono(
            x2, dy, lp, config, images_per_cell=ipc)

    @jax.jit
    def bwd_mlp_light(x2, dy, lp):
        return fused_block.fused_bwd_stage_mlp_light(
            x2, dy, lp, config, images_per_cell=ipc)

    @jax.jit
    def bwd_mlp_wgrad(x2, dy, hid_s, dhp_s, lp):
        return fused_block.fused_bwd_stage_mlp_wgrad(
            x2, dy, hid_s, dhp_s, lp, config,
            images_per_cell=ipc, mlp_chunks=mlp_chunks)

    @jax.jit
    def bwd_attn(x, dx2, lp):
        return fused_block.fused_bwd_stage_attn(
            x, dx2, lp, config, images_per_cell=ipc)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def scatter(dlp_raw, acc, g):
        """Write one layer's raw [1, ...] fp32 grads into the stacked
        accumulator at index ``g`` (donated in place)."""
        return jax.tree.map(
            lambda a, dv: jax.lax.dynamic_update_index_in_dim(
                a, dv[0].astype(a.dtype), g, 0),
            acc, dlp_raw)

    def staged_layer_bwd(x_in, dy, layers, g, acc):
        lp = slice_layer(layers, g)
        x2 = bwd_x2(x_in, lp)
        if mlp_chunks == 1:
            dx2, mlp_g = bwd_mlp_mono(x2, dy, lp)
        else:
            dx2, hid_s, dhp_s, mlp_g = bwd_mlp_light(x2, dy, lp)
            wg = bwd_mlp_wgrad(x2, dy, hid_s, dhp_s, lp)
            mlp_g = dict(mlp_g, fc1_w=wg[0], fc2_w=wg[1])
        dy, attn_g = bwd_attn(x_in, dx2, lp)
        return dy, scatter({**mlp_g, **attn_g}, acc, g)

    @jax.jit
    def stem_bwd(images, rest, dx0):
        _, vjp = jax.vjp(lambda r: _stem(images, r), rest)
        return vjp(dx0.astype(compute_dtype))[0]

    # NOTE: params are NOT donated — callers reuse the tree across calls
    # (and across step objects), matching make_train_step's contract.
    @jax.jit
    def update(params, layer_grads, rest_grads_head, rest_grads_stem):
        grads = {
            k: (jax.tree.map(jnp.add, rest_grads_head[k],
                             rest_grads_stem[k])
                if k != "layers" else layer_grads)
            for k in params
        }
        if grad_clip_norm is not None:
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads)))
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)
        return jax.tree.map(
            lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params, grads)

    def step(params, images, labels):
        rest = {k: v for k, v in params.items() if k != "layers"}
        layers = params["layers"]
        x = stem_fwd(images, rest)
        saved = []
        for g in range(n_groups):
            x, xs = grp_fwd(x, layers, g)
            saved.append(xs)
        loss, dy, drest_head = head_fwd_bwd(x, rest, labels)
        acc = jax.tree.map(
            lambda a: jnp.zeros(jnp.shape(a),
                                a.dtype if jnp.issubdtype(
                                    a.dtype, jnp.floating) else jnp.float32),
            layers)
        for g in reversed(range(n_groups)):
            if backward == "fused_staged":
                dy, acc = staged_layer_bwd(saved[g][0], dy, layers, g, acc)
            else:
                dy, acc = grp_bwd(saved[g], layers, g, dy, acc)
            saved[g] = None  # free the group's activations promptly
        drest_stem = stem_bwd(images, rest, dy)
        new_params = update(params, acc, drest_head, drest_stem)
        return new_params, loss

    step.n_programs = 5
    step.n_groups = n_groups
    # Exposed for compile-probing (scripts/probe_split_compile.py): which
    # of the five programs a compile-limited target rejects.
    step.programs = {
        "stem_fwd": stem_fwd, "grp_fwd": grp_fwd,
        "head_fwd_bwd": head_fwd_bwd, "grp_bwd": grp_bwd,
        "stem_bwd": stem_bwd, "update": update,
    }
    if backward == "fused_staged":
        del step.programs["grp_bwd"]
        step.programs.update({
            "slice_layer": slice_layer,
            "bwd_x2": bwd_x2,
            ("bwd_mlp_mono" if mlp_chunks == 1 else "bwd_mlp_light"):
                bwd_mlp_mono if mlp_chunks == 1 else bwd_mlp_light,
            "bwd_attn": bwd_attn, "scatter": scatter,
        })
        if mlp_chunks != 1:
            step.programs["bwd_mlp_wgrad"] = bwd_mlp_wgrad
    return step
