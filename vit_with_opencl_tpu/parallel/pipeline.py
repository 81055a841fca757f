"""Pipeline parallelism: encoder layers sharded across a "pipe" mesh axis.

GPipe-style inference: device *s* holds layers [s·L/P, (s+1)·L/P) — the
stacked layer pytree is simply sharded on its leading (layer) axis — and
microbatches flow through the stage ring via ``jax.lax.ppermute``. The
schedule runs M + P − 1 steps; each step every stage processes its current
microbatch (masked out during pipeline fill/drain bubbles) and passes the
activation to the next stage.

For a 12-layer ViT on a handful of chips, tensor parallelism (spmd.py) is
the better fit — each layer's weights comfortably fit one chip. Pipeline
parallelism is the capability that matters when depth × width outgrows a
single chip's HBM; it is exercised by the multichip dry run and validated
against the golden model on the virtual mesh.
"""

from __future__ import annotations


from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ViTConfig
from ..models import vit

Params = Dict[str, Any]


def make_pipe_mesh(n_stages: int, *, devices=None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size < n_stages:
        raise ValueError(f"need {n_stages} devices, have {devs.size}")
    return Mesh(devs[:n_stages].reshape(n_stages), axis_names=("pipe",))


def bubble_fraction(n_microbatches: int, n_stages: int,
                    interleave: int = 1) -> float:
    """Fraction of stage-compute capacity wasted in pipeline fill/drain.

    GPipe (interleave=1): 1 − M/(M+S−1). Interleaved virtual stages divide
    each stage's layers into ``v`` chunks a microbatch visits in ``v`` ring
    laps, shrinking every bubble step to 1/v of a stage's work: for M <= S,
    1 − vM/(M+vS−1). For M > S the schedule runs ``ceil(M/S)`` WAVES of at
    most S microbatches, injected back to back with period vS (wave w+1's
    lap-0 window opens exactly as wave w's lap-(v−1) stream drains), so
    total steps = (W−1)·vS + ((M−1) mod S) + vS and useful per-stage chunk
    steps = vM.
    """
    m, s, v = n_microbatches, n_stages, interleave
    if v == 1:
        return 1.0 - m / (m + s - 1)
    waves = -(-m // s)
    total = (waves - 1) * v * s + ((m - 1) % s) + v * s
    return 1.0 - (v * m) / total


def _interleave_perm(depth: int, n_stages: int, interleave: int):
    """Layer-axis permutation so a contiguous P("pipe") shard of stage ``s``
    holds virtual-stage chunks (s, S+s, 2S+s, ...) back to back."""
    w = depth // (n_stages * interleave)
    return [
        k * w + i
        for s in range(n_stages)
        for j in range(interleave)
        for k in (j * n_stages + s,)
        for i in range(w)
    ]


def shard_params_pp(params: Params, mesh: Mesh, config: ViTConfig,
                    *, interleave: int = 1) -> Params:
    """Layers sharded on the layer axis over "pipe"; everything else
    replicated. Requires depth % (n_stages * interleave) == 0.

    ``interleave`` > 1 lays layers out for the interleaved schedule
    (``pp_forward(..., interleave=v)``): stage ``s`` holds layer chunks
    s, S+s, ... instead of one contiguous block.
    """
    n_stages = mesh.shape["pipe"]
    if config.depth % (n_stages * interleave):
        raise ValueError(
            f"depth {config.depth} not divisible by {n_stages} pipeline "
            f"stages x {interleave} virtual chunks"
        )
    if interleave > 1:
        perm = np.asarray(_interleave_perm(config.depth, n_stages, interleave))
        params = dict(params)
        params["layers"] = jax.tree.map(
            lambda a: np.take(np.asarray(a), perm, axis=0), params["layers"]
        )
    else:
        params = dict(params)
    specs = jax.tree.map(lambda _: P(), params)
    specs["layers"] = jax.tree.map(lambda _: P("pipe"), params["layers"])
    out = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    # Layout tag: pp_forward refuses to run a schedule that doesn't match
    # the interleave permutation these params were laid out with (a silent
    # mismatch would reorder the encoder layers and corrupt every output).
    # Kept HOST-side (added after the device_put) so reading it back never
    # costs a device fetch — on tunneled runtimes a blocking device_get per
    # pp_forward call would serialize otherwise-queueable dispatches.
    out["pp_interleave"] = np.int32(interleave)
    return out


@jax.custom_vjp
def _psum_replicated_grad(x):
    """``psum`` over "pipe" whose backward is per-rank identity.

    For y = Σ_r x_r the true cotangent of x_r is ∂L/∂y — and every rank
    holds that same (replicated) cotangent, so identity is exact. Under
    ``shard_map(check_vma=False)`` the default transpose of ``psum`` is
    another psum, which would multiply every upstream pipeline gradient by
    the stage count (measured: exactly 2x on a 2-stage ring before this
    wrapper)."""
    return jax.lax.psum(x, "pipe")


def _psum_rg_fwd(x):
    return jax.lax.psum(x, "pipe"), None


def _psum_rg_bwd(_, ct):
    return (ct,)


_psum_replicated_grad.defvjp(_psum_rg_fwd, _psum_rg_bwd)


def _staged_features(imgs, p, config: ViTConfig, kernels, M: int, S: int,
                     V: int, compute_dtype) -> jax.Array:
    """The staged encoder schedule (runs INSIDE shard_map over "pipe").

    Embed runs replicated; microbatches rotate through the stage ring via
    ``ppermute``; the last stage's recorded outputs are psum-broadcast and
    final-LN'd. Returns fp32 features [B, T, D]. Fully reverse-
    differentiable: every loop has a static trip count (``fori_loop``
    lowers to scan), and the transpose of the forward's ppermute rotation
    IS the GPipe backward schedule — activations flow stage 0→S−1 forward,
    cotangents S−1→0 backward, with the same fill/drain bubble.
    """
    stage = jax.lax.axis_index("pipe")
    b = imgs.shape[0]
    mb = b // M
    x = vit.embed(imgs, p, config, compute_dtype)  # [B, T, D] replicated
    if config.pre_norm:
        x = kernels["layer_norm"](x, p["pre_ln_w"], p["pre_ln_b"], config.eps)
    t, d = x.shape[1], x.shape[2]
    mbs = x.reshape(M, mb, t, d)

    def block(hh, lp):
        hh = hh + vit._attention_block(hh, lp, config, kernels)
        hh = hh + vit._mlp_block(hh, lp, config, kernels)
        return hh, None

    def run_local_layers(h):
        out, _ = jax.lax.scan(block, h, p["layers"])
        return out

    chunk_layers = config.depth // (S * V)

    def run_chunk(h, j):
        # One virtual-stage chunk: layers [j*W, (j+1)*W) of this stage's
        # interleave-permuted local shard.
        chunk = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(
                a, j * chunk_layers, chunk_layers, axis=0
            ),
            p["layers"],
        )
        out, _ = jax.lax.scan(block, h, chunk)
        return out

    carry = jnp.zeros((mb, t, d), compute_dtype)  # inbound activation
    outputs = jnp.zeros((M, mb, t, d), compute_dtype)
    perm = [(i, (i + 1) % S) for i in range(S)]

    if V == 1:

        def step_fn(step, state):
            carry, outputs = state
            # Stage 0 ingests microbatch `step` (clamped); later stages
            # take the rotated activation from the previous stage.
            feed_idx = jnp.clip(step, 0, M - 1)
            inp = jnp.where(stage == 0, mbs[feed_idx], carry)
            y = run_local_layers(inp)
            # Stage s is active for microbatch (step - s) in [0, M).
            mb_idx = step - stage
            active = (mb_idx >= 0) & (mb_idx < M)
            # Final stage records finished microbatches.
            record = active & (stage == S - 1)
            out_idx = jnp.clip(mb_idx, 0, M - 1)
            updated = jax.lax.dynamic_update_index_in_dim(
                outputs, y.astype(compute_dtype), out_idx, axis=0
            )
            outputs = jnp.where(record, updated, outputs)
            carry = jax.lax.ppermute(y, "pipe", perm)
            return carry, outputs

        n_steps = M + S - 1
    else:
        # Interleaved schedule with WAVES: microbatch m (wave w = m//S,
        # slot r = m%S) runs virtual stage k = j*S + s at step
        # w·VS + r + j·S + s. rel = step − stage decomposes uniquely as
        # (w, j, r) = (rel // VS, rel % VS // S, rel % S) — each stage
        # does exactly one 1/V-stage chunk per step, and wave w+1's
        # lap-0 injection window [w·VS, w·VS+S) at stage 0 opens exactly
        # as wave w's lap-(V−1) stream [w·VS−S, w·VS) drains, so waves
        # pipeline back to back with no collision for ANY M.
        W = -(-M // S)  # number of waves

        def step_fn(step, state):
            carry, outputs = state
            rel = step - stage
            relc = jnp.clip(rel, 0, W * V * S - 1)
            within = relc % (V * S)
            lap = within // S
            m_idx = (relc // (V * S)) * S + within % S
            active = (rel >= 0) & (rel < W * V * S) & (m_idx < M)
            feed = (stage == 0) & (lap == 0) & active
            inp = jnp.where(feed, mbs[jnp.clip(m_idx, 0, M - 1)], carry)
            y = run_chunk(inp, lap)
            record = active & (stage == S - 1) & (lap == V - 1)
            out_idx = jnp.clip(m_idx, 0, M - 1)
            updated = jax.lax.dynamic_update_index_in_dim(
                outputs, y.astype(compute_dtype), out_idx, axis=0
            )
            outputs = jnp.where(record, updated, outputs)
            carry = jax.lax.ppermute(y, "pipe", perm)
            return carry, outputs

        # Last microbatch (wave W−1, slot (M−1)%S) finishes lap V−1 at
        # stage S−1 at step (W−1)·VS + (M−1)%S + (V−1)·S + (S−1).
        n_steps = (W - 1) * V * S + ((M - 1) % S) + V * S

    _, outputs = jax.lax.fori_loop(0, n_steps, step_fn, (carry, outputs))
    # Broadcast the last stage's outputs to every device.
    outputs = _psum_replicated_grad(
        jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs))
    )
    feats = outputs.reshape(b, t, d)
    feats = vit.layer_norm(feats, p["final_ln_w"], p["final_ln_b"], config.eps)
    return feats.astype(jnp.float32)


def pp_forward(
    images: jax.Array,
    params: Params,
    config: ViTConfig,
    mesh: Mesh,
    *,
    n_microbatches: int = 4,
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "xla",
    return_logits: bool = False,
    interleave: int = 1,
):
    """Pipelined forward over the "pipe" axis → probabilities [B, classes].

    Batch must divide into ``n_microbatches``. Embed and head run replicated
    (they are tiny next to the encoder); only the encoder stack is staged.

    ``interleave`` (v): virtual-stage chunks per device. v=1 is plain GPipe
    (M+S−1 steps of full-stage work). v>1 splits each stage's layers into v
    chunks that a microbatch visits over v ring laps, each step costing
    (1/v)-stage work, cutting the fill/drain bubble by ~v
    (``bubble_fraction``). Requires params laid out by
    ``shard_params_pp(..., interleave=v)``. M > S is scheduled as
    back-to-back WAVES of at most S microbatches (wave w injects during
    steps [w·vS, w·vS+S), exactly the window after wave w−1's last lap has
    left stage 0), so any microbatch count works without caller-side batch
    splitting.
    """
    n_stages = mesh.shape["pipe"]
    kernels = vit.resolve_kernels(attention_impl)
    b = images.shape[0]
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")
    mb = b // n_microbatches
    M, S, V = n_microbatches, n_stages, interleave
    tag = params.get("pp_interleave")
    if tag is None:
        laid_out = 1
    elif isinstance(tag, (int, np.integer)):
        laid_out = int(tag)  # host-side tag: free to read
    else:  # device-resident tag from an older shard_params_pp tree
        laid_out = int(np.asarray(jax.device_get(tag)))
    if laid_out != V:
        raise ValueError(
            f"params were laid out by shard_params_pp(interleave="
            f"{laid_out}) but pp_forward was called with interleave={V}; "
            f"the layer order would be wrong — re-shard with the matching "
            f"interleave"
        )
    if V > 1 and config.depth % (S * V):
        raise ValueError(
            f"depth {config.depth} not divisible by {S} stages x {V} chunks"
        )

    pspecs = jax.tree.map(lambda _: P(), params)
    pspecs["layers"] = jax.tree.map(lambda _: P("pipe"), params["layers"])

    def fn(imgs, p):
        feats = _staged_features(imgs, p, config, kernels, M, S, V,
                                 compute_dtype)
        if config.head_type == "none":
            return feats[:, 0]
        logits = vit.classifier_logits(feats, p, config, compute_dtype)
        if return_logits:
            return logits
        return jax.nn.softmax(logits, axis=-1)

    def build():
        return jax.jit(jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), pspecs),
            out_specs=P(),
            check_vma=False,
        ))

    from .spmd import _cached_program

    cache_key = ("pp", config, mesh, n_microbatches, b, interleave,
                 jnp.dtype(compute_dtype), attention_impl, return_logits,
                 jax.tree.structure(params))
    return _cached_program(cache_key, build)(images, params)


# ---------------------------------------------------------------------------
# Pipeline-parallel TRAINING (GPipe schedule in both directions)
# ---------------------------------------------------------------------------
#
# The backward schedule is the exact transpose of the forward one: the
# staged forward is built from reverse-differentiable primitives only
# (static-trip-count ``fori_loop`` → scan, ``ppermute`` whose transpose is
# the reverse rotation, ``psum`` whose transpose is a broadcast), so
# ``jax.grad`` through ``_staged_features`` IS GPipe's 1F-then-1B schedule:
# microbatch cotangents enter at the last stage and rotate backward through
# the ring while earlier stages drain, with the same M/(M+S−1) bubble as the
# forward. Activation stashing is the scan's linearization store — the
# standard GPipe memory shape (one stage's activations per microbatch in
# flight).


def pp_train_step(
    config: ViTConfig,
    mesh: Mesh,
    *,
    n_microbatches: int = 4,
    lr: float = 1e-3,
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "xla",
    interleave: int = 1,
    label_smoothing: float = 0.0,
):
    """SGD training step over the "pipe" mesh: layers stage-sharded
    (``shard_params_pp`` layout), loss = cross-entropy on the staged
    forward, backward through the transposed schedule.

    Returns ``step(params, images, labels) -> (new_params, loss)``. Batch
    must divide into ``n_microbatches``. Gradients for the stage-sharded
    layer stack stay local to their stage; embed-side grads (consumed only
    by stage 0's feed) are psum-broadcast so the replicated copies update
    in lockstep; head/final-LN grads are computed identically on every
    stage (the recorded outputs are psum-replicated) and need no
    collective.
    """
    S = mesh.shape["pipe"]
    M, V = n_microbatches, interleave
    kernels = vit.resolve_kernels(attention_impl)
    if config.depth % (S * V):
        raise ValueError(
            f"depth {config.depth} not divisible by {S} stages x {V} chunks")
    if not 0.0 <= label_smoothing < 1.0:
        raise ValueError(
            f"label_smoothing must be in [0, 1), got {label_smoothing}")

    # Embed-side params feed the schedule only through stage 0 (the feed
    # mux), so their per-stage grads are zero except on stage 0 — psum
    # restores the replicated full gradient. Keyed by name: everything
    # replicated except the layer stack and the head/final-LN group (whose
    # grads are already replicated via the psum-broadcast outputs).
    _STAGE0_KEYS = ("patch_w", "patch_b", "pos_emb", "prefix_tokens",
                    "pre_ln_w", "pre_ln_b")

    def fn(imgs, labels, p):
        def loss_fn(pp):
            feats = _staged_features(imgs, pp, config, kernels, M, S, V,
                                     compute_dtype)
            logits = vit.classifier_logits(feats, pp, config, compute_dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            if labels.ndim == 2:  # soft labels (Mixup/CutMix)
                nll = -jnp.mean(
                    jnp.sum(labels.astype(logp.dtype) * logp, -1))
            else:
                nll = -jnp.mean(
                    jnp.take_along_axis(logp, labels[:, None], axis=-1))
            if label_smoothing:
                uniform = -jnp.mean(logp)
                nll = ((1.0 - label_smoothing) * nll
                       + label_smoothing * uniform)
            return nll

        loss, grads = jax.value_and_grad(loss_fn)(p)
        grads = {
            k: (jax.lax.psum(g, "pipe") if k in _STAGE0_KEYS else g)
            for k, g in grads.items()
        }
        new_p = jax.tree.map(
            lambda w, g: (w - lr * g.astype(jnp.float32)).astype(w.dtype)
            if jnp.issubdtype(w.dtype, jnp.floating) else w,
            p, grads,
        )
        return new_p, loss

    def build(pspecs):
        return jax.jit(jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(), pspecs),
            out_specs=(pspecs, P()),
            check_vma=False,
        ))

    from .spmd import _cached_program

    def step(params, images, labels):
        tag = params.get("pp_interleave")
        laid_out = 1 if tag is None else int(tag)
        if laid_out != V:
            raise ValueError(
                f"params were laid out by shard_params_pp(interleave="
                f"{laid_out}) but pp_train_step was built with interleave="
                f"{V}; re-shard with the matching interleave")
        core = {k: v for k, v in params.items() if k != "pp_interleave"}
        pspecs = jax.tree.map(lambda _: P(), core)
        pspecs["layers"] = jax.tree.map(lambda _: P("pipe"), core["layers"])
        b = images.shape[0]
        if b % M:
            raise ValueError(f"batch {b} not divisible by {M} microbatches")
        cache_key = ("pp_train", config, mesh, M, V, b,
                     jnp.dtype(compute_dtype), attention_impl, lr,
                     label_smoothing, jax.tree.structure(core))
        compiled = _cached_program(cache_key, lambda: build(pspecs))
        new_core, loss = compiled(images, labels, core)
        if tag is not None:
            new_core["pp_interleave"] = tag
        return new_core, loss

    return step


# ---------------------------------------------------------------------------
# 1F1B pipeline training: bounded activation memory, any microbatch count
# ---------------------------------------------------------------------------
#
# ``pp_train_step`` above differentiates THROUGH the staged forward loop, so
# XLA's linearization store stashes every step's per-layer residuals — memory
# grows linearly with the microbatch count M (GPipe's memory shape). The
# explicit schedule below interleaves one forward and one backward chunk per
# clock tick (PipeDream-flush / 1F1B), stashes only each in-flight
# microbatch's STAGE INPUT in a fixed 2S-slot ring, and rematerializes the
# stage forward inside ``jax.vjp`` during the backward slot — peak activation
# memory is O(S · microbatch), independent of M, so arbitrarily large batches
# train at fixed HBM.
#
# Clock layout (unit-cost F and B per stage per tick):
#   forward  of microbatch m at stage s:  tick  m + s
#   backward of microbatch m at stage s:  tick  m + 2S − 1 − s
# which satisfies f(s,m) ≥ f(s−1,m)+1, b(s,m) ≥ b(s+1,m)+1 and
# b(S−1,m) = f(S−1,m)+1 (the last stage turns a microbatch around
# immediately — the defining 1F1B property). In-flight microbatches at stage
# s number at most 2(S−s)−1 < 2S, so an m-mod-2S stash ring never collides.
# Total ticks: M + 2S − 1.
#
# SPMD uniformity trick: each backward slot runs ONE ``jax.vjp`` over
#   (x, local_layers, head_params) ↦ (stage_out, microbatch_loss)
# seeding the cotangent (0, 1/M) on the last stage (loss-sourced) and
# (dy_in, 0) everywhere else — head/final-LN grads fall out only where the
# loss term is live, inner stages get pure activation cotangents, and every
# device executes the same program. Embed grads are recovered at stage 0's
# backward slot by a per-microbatch ``jax.vjp`` of the (replicated, cheap)
# embed. Reference bar: none (beyond-reference) — completes the §2.3
# parallelism matrix's training half at bounded memory.


def pp_train_step_1f1b(
    config: ViTConfig,
    mesh: Mesh,
    *,
    n_microbatches: int = 4,
    lr: float = 1e-3,
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "xla",
    label_smoothing: float = 0.0,
):
    """1F1B-scheduled SGD step over the "pipe" mesh.

    Same contract as ``pp_train_step`` (plain ``shard_params_pp`` layout,
    hard or soft labels, returns ``step(params, images, labels) ->
    (new_params, loss)``) but with bounded activation stashing: at most 2S
    stage-input activations live at once regardless of ``n_microbatches``,
    with the stage forward rematerialized during its backward slot.
    Interleaved (virtual-stage) layouts are not supported — re-shard with
    ``shard_params_pp(..., interleave=1)``.
    """
    from ..models import quant

    S = mesh.shape["pipe"]
    M = n_microbatches
    K = 2 * S  # stash ring slots; in-flight ≤ 2S−1 so m-mod-K never collides
    kernels = vit.resolve_kernels(attention_impl)
    if config.depth % S:
        raise ValueError(f"depth {config.depth} not divisible by {S} stages")
    if not 0.0 <= label_smoothing < 1.0:
        raise ValueError(
            f"label_smoothing must be in [0, 1), got {label_smoothing}")

    _EMB_KEYS = ("patch_w", "patch_b", "prefix_tokens", "pos_emb",
                 "pre_ln_w", "pre_ln_b")
    _HEAD_KEYS = ("final_ln_w", "final_ln_b", "head_w", "head_b",
                  "head_dist_w", "head_dist_b")

    def fn(imgs, labels, p):
        stage = jax.lax.axis_index("pipe")
        is_last = stage == S - 1
        b = imgs.shape[0]
        mb = b // M
        lp_local = p["layers"]
        emb_p = {k: p[k] for k in _EMB_KEYS if k in p}
        head_p = {k: p[k] for k in _HEAD_KEYS if k in p}

        def emb_fn(ep, im):
            q = dict(p)
            q.update(ep)
            x = vit.embed(im, q, config, compute_dtype)
            if config.pre_norm:
                x = kernels["layer_norm"](x, q["pre_ln_w"], q["pre_ln_b"],
                                          config.eps)
            return x

        def stage_fn(x, lp):
            def block(hh, l):
                hh = hh + vit._attention_block(hh, l, config, kernels)
                hh = hh + vit._mlp_block(hh, l, config, kernels)
                return hh, None

            out, _ = jax.lax.scan(block, x, lp)
            return out

        def mb_loss(feats, hp, lbl):
            # Per-microbatch mean CE, scaled 1/M so the accumulated sum (and
            # its gradients) equals the global batch-mean loss.
            q = dict(p)
            q.update(hp)
            f32 = vit.layer_norm(
                feats, q["final_ln_w"], q["final_ln_b"], config.eps
            ).astype(jnp.float32)
            logits = vit.classifier_logits(f32, q, config, compute_dtype)
            logp = jax.nn.log_softmax(logits, axis=-1)
            if lbl.ndim == 2:  # soft labels (Mixup/CutMix)
                nll = -jnp.mean(jnp.sum(lbl.astype(logp.dtype) * logp, -1))
            else:
                nll = -jnp.mean(
                    jnp.take_along_axis(logp, lbl[:, None], axis=-1))
            if label_smoothing:
                uniform = -jnp.mean(logp)
                nll = ((1.0 - label_smoothing) * nll
                       + label_smoothing * uniform)
            return nll / M

        # Replicated embed feed (cheap next to the encoder), as microbatches.
        x0 = emb_fn(emb_p, imgs)
        t_len, d = x0.shape[1], x0.shape[2]
        mbs = x0.reshape(M, mb, t_len, d)
        imgs_m = imgs.reshape((M, mb) + imgs.shape[1:])
        lbls_m = labels.reshape((M, mb) + labels.shape[1:])

        perm_fwd = [(i, (i + 1) % S) for i in range(S)]
        perm_bwd = [(i, (i - 1) % S) for i in range(S)]
        f32 = jnp.float32

        def zeros_like_f32(tree):
            return jax.tree.map(lambda a: jnp.zeros(a.shape, f32), tree)

        init = (
            jnp.zeros((mb, t_len, d), compute_dtype),   # fwd activation ring
            jnp.zeros((mb, t_len, d), compute_dtype),   # bwd cotangent ring
            jnp.zeros((K, mb, t_len, d), compute_dtype),  # stash ring
            zeros_like_f32(lp_local),                   # layer-grad shard
            zeros_like_f32(emb_p),                      # embed grads (stage 0)
            zeros_like_f32(head_p),                     # head grads (stage S−1)
            jnp.zeros((), f32),                         # loss accumulator
        )

        def tick(t, state):
            fwd, bwd, stash, gl, ge, gh, lacc = state

            # ---- forward slot: microbatch t − s ----
            mf = t - stage
            f_act = (mf >= 0) & (mf < M)
            mf_c = jnp.clip(mf, 0, M - 1)
            inp = jnp.where(stage == 0, mbs[mf_c], fwd)
            slot_f = mf_c % K
            cur = jax.lax.dynamic_index_in_dim(stash, slot_f, 0,
                                               keepdims=False)
            stash = jax.lax.dynamic_update_index_in_dim(
                stash, jnp.where(f_act, inp, cur), slot_f, axis=0)
            y = stage_fn(inp, lp_local)
            fwd = jax.lax.ppermute(y, "pipe", perm_fwd)

            # ---- backward slot: microbatch t − (2S − 1 − s) ----
            mb_i = t - (2 * S - 1 - stage)
            b_act = (mb_i >= 0) & (mb_i < M)
            mb_c = jnp.clip(mb_i, 0, M - 1)
            x_st = jax.lax.dynamic_index_in_dim(
                stash, mb_c % K, 0, keepdims=False)
            lbl = jax.lax.dynamic_index_in_dim(lbls_m, mb_c, 0,
                                               keepdims=False)

            def fwd_and_loss(xx, lp, hp):
                feats = stage_fn(xx, lp)  # remat: forward recomputed here
                return feats, mb_loss(feats, hp, lbl)

            (feats, lval), vjp = jax.vjp(fwd_and_loss, x_st, lp_local, head_p)
            d_feats = jnp.where(is_last, jnp.zeros_like(bwd), bwd)
            d_loss = jnp.where(is_last, f32(1.0), f32(0.0))
            dx, dlp, dhp = vjp((d_feats.astype(feats.dtype), d_loss))

            wb = jnp.where(b_act, f32(1.0), f32(0.0))
            gl = jax.tree.map(lambda a, g: a + wb * g.astype(f32), gl, dlp)
            gh = jax.tree.map(lambda a, g: a + wb * g.astype(f32), gh, dhp)
            lacc = lacc + wb * jnp.where(is_last, lval, f32(0.0))

            # Stage 0's dx is the cotangent of the embed output — close the
            # chain with a per-microbatch embed vjp (replicated + cheap; the
            # result is masked off every other stage).
            im = jax.lax.dynamic_index_in_dim(imgs_m, mb_c, 0, keepdims=False)
            _, evjp = jax.vjp(lambda ep: emb_fn(ep, im), emb_p)
            (dep,) = evjp(dx.astype(x0.dtype))
            we = wb * jnp.where(stage == 0, f32(1.0), f32(0.0))
            ge = jax.tree.map(lambda a, g: a + we * g.astype(f32), ge, dep)

            bwd = jax.lax.ppermute(dx.astype(compute_dtype), "pipe", perm_bwd)
            return fwd, bwd, stash, gl, ge, gh, lacc

        n_ticks = M + 2 * S - 1
        _, _, _, gl, ge, gh, loss = jax.lax.fori_loop(0, n_ticks, tick, init)

        # Embed grads live on stage 0, head grads + loss on stage S−1:
        # psum replicates them (layer grads stay stage-local by design).
        ge = jax.tree.map(lambda g: jax.lax.psum(g, "pipe"), ge)
        gh = jax.tree.map(lambda g: jax.lax.psum(g, "pipe"), gh)
        loss = jax.lax.psum(loss, "pipe")

        grads = dict(ge)
        grads.update(gh)
        grads["layers"] = gl

        def sgd(w, g):
            if not jnp.issubdtype(w.dtype, jnp.floating):
                return w
            return (w - lr * g.astype(jnp.float32)).astype(w.dtype)

        new_p = {
            k: jax.tree.map(sgd, w, grads[k]) if k == "layers"
            else sgd(w, grads[k])
            for k, w in p.items()
        }
        return new_p, loss

    def build(pspecs):
        return jax.jit(jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(), P(), pspecs),
            out_specs=(pspecs, P()),
            check_vma=False,
        ))

    from .spmd import _cached_program

    def step(params, images, labels):
        tag = params.get("pp_interleave")
        laid_out = 1 if tag is None else int(tag)
        if laid_out != 1:
            raise ValueError(
                f"pp_train_step_1f1b supports only the plain layout; params "
                f"were laid out with interleave={laid_out} — re-shard with "
                f"shard_params_pp(..., interleave=1)")
        core = {k: v for k, v in params.items() if k != "pp_interleave"}
        if quant.is_quantized(core["layers"]["qkv_w"]):
            raise ValueError(
                "pp_train_step_1f1b trains float params only; dequantize "
                "before training")
        pspecs = jax.tree.map(lambda _: P(), core)
        pspecs["layers"] = jax.tree.map(lambda _: P("pipe"), core["layers"])
        b = images.shape[0]
        if b % M:
            raise ValueError(f"batch {b} not divisible by {M} microbatches")
        cache_key = ("pp_train_1f1b", config, mesh, M, b,
                     jnp.dtype(compute_dtype), attention_impl, lr,
                     label_smoothing, jax.tree.structure(core))
        compiled = _cached_program(cache_key, lambda: build(pspecs))
        new_core, loss = compiled(images, labels, core)
        if tag is not None:
            new_core["pp_interleave"] = tag
        return new_core, loss

    return step
