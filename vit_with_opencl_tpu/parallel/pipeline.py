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


def shard_params_pp(params: Params, mesh: Mesh, config: ViTConfig) -> Params:
    """Layers sharded on the layer axis over "pipe"; everything else
    replicated. Requires depth % n_stages == 0."""
    n_stages = mesh.shape["pipe"]
    if config.depth % n_stages:
        raise ValueError(
            f"depth {config.depth} not divisible by {n_stages} pipeline stages"
        )
    specs = jax.tree.map(lambda _: P(), params)
    specs["layers"] = jax.tree.map(lambda _: P("pipe"), params["layers"])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


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
):
    """Pipelined forward over the "pipe" axis → probabilities [B, classes].

    Batch must divide into ``n_microbatches``. Embed and head run replicated
    (they are tiny next to the encoder); only the encoder stack is staged.
    """
    n_stages = mesh.shape["pipe"]
    kernels = vit.resolve_kernels(attention_impl)
    b = images.shape[0]
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")
    mb = b // n_microbatches
    M, S = n_microbatches, n_stages

    pspecs = jax.tree.map(lambda _: P(), params)
    pspecs["layers"] = jax.tree.map(lambda _: P("pipe"), params["layers"])

    def fn(imgs, p):
        stage = jax.lax.axis_index("pipe")
        x = vit.embed(imgs, p, config, compute_dtype)  # [B, T, D] replicated
        if config.pre_norm:
            x = kernels["layer_norm"](x, p["pre_ln_w"], p["pre_ln_b"], config.eps)
        t, d = x.shape[1], x.shape[2]
        mbs = x.reshape(M, mb, t, d)

        def run_local_layers(h):
            def block(hh, lp):
                hh = hh + vit._attention_block(hh, lp, config, kernels)
                hh = hh + vit._mlp_block(hh, lp, config, kernels)
                return hh, None

            out, _ = jax.lax.scan(block, h, p["layers"])
            return out

        carry = jnp.zeros((mb, t, d), compute_dtype)  # inbound activation
        outputs = jnp.zeros((M, mb, t, d), compute_dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def step_fn(step, state):
            carry, outputs = state
            # Stage 0 ingests microbatch `step` (clamped); later stages take
            # the rotated activation from the previous stage.
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

        _, outputs = jax.lax.fori_loop(0, M + S - 1, step_fn, (carry, outputs))
        # Broadcast the last stage's outputs to every device.
        outputs = jax.lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)), "pipe"
        )
        feats = outputs.reshape(b, t, d)
        feats = vit.layer_norm(feats, p["final_ln_w"], p["final_ln_b"], config.eps)
        feats = feats.astype(jnp.float32)
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

    cache_key = ("pp", config, mesh, n_microbatches, b,
                 jnp.dtype(compute_dtype), attention_impl, return_logits,
                 jax.tree.structure(params))
    return _cached_program(cache_key, build)(images, params)
