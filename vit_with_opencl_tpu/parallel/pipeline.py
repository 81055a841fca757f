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
