"""Training loop: data pipeline + sharded step + checkpoint/resume + metrics.

The reference is inference-only (Main.c drives one forward pass and a
comparator); training is a capability this framework adds. The loop
composes the pieces that already exist — :mod:`data`'s prefetcher,
:func:`parallel.spmd.make_train_step` (GSPMD over a ("data", "model")
mesh, fused/flash Pallas VJPs, gradient accumulation) and
:mod:`io.checkpoint` (Orbax) — and adds the operational glue a production
run needs: periodic checkpoints with resume, throughput/loss logging
without per-step host fetches (each fetch is a dispatch round trip on a
tunneled runtime; we only touch the loss at log points).
"""
from __future__ import annotations

import os
import re
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .config import ViTConfig
from .data import DevicePrefetcher
from .io import checkpoint as ckpt_io
from .models import vit
from .parallel import spmd

__all__ = ["Trainer"]

_STEP_RE = re.compile(r"^step_(\d{8})$")


def _f32_shadow(params):
    """fp32 copy of every floating leaf (the EMA shadow's dtype contract:
    a bf16 shadow with decay ~0.9999 has per-step increments below bf16 ulp
    and silently freezes — timm's ModelEmaV2 keeps fp32 for the same
    reason; cast back only at export)."""
    return jax.tree.map(
        lambda p: p.astype(jnp.float32)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
        params,
    )


def _abstract_like(metadata_tree):
    """Checkpoint-metadata subtree (io.checkpoint.checkpoint_structure) →
    abstract restore template with the checkpoint's own shapes/dtypes."""
    return jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(tuple(m.shape), np.dtype(str(m.dtype))),
        metadata_tree,
    )


class Trainer:
    """Owns params/optimizer state and runs the step loop over a mesh.

    >>> tr = Trainer(cfg, lr=1e-3, optimizer="adamw", attention_impl="fused")
    >>> params = tr.fit(batches, steps=1000)

    ``attention_impl="split:<backward>[:G]"`` (backward ∈ fused /
    fused_staged / flash) selects the program-split host-loop step for
    compile-limited targets — the single-chip ViT-G route.

    ``batches`` is any iterable of host ``(images, labels)`` pairs (see
    :func:`data.memory_dataset`); the trainer prefetches them onto the mesh
    with the batch axis sharded over "data".
    """

    def __init__(
        self,
        config: ViTConfig,
        *,
        mesh=None,
        lr: float = 1e-3,
        schedule: Optional[str] = None,
        warmup_steps: int = 0,
        total_steps: Optional[int] = None,
        optimizer: str = "sgd",
        weight_decay: float = 0.05,
        compute_dtype=jnp.bfloat16,
        attention_impl: str = "xla",
        grad_accum: int = 1,
        scan_unroll: int = 1,
        tuning: Optional[dict] = None,
        batch_size: Optional[int] = None,
        tuning_path: Optional[str] = None,
        grad_clip_norm: Optional[float] = None,
        label_smoothing: float = 0.0,
        mixup: Optional[dict] = None,
        device_augment: Optional[dict] = None,
        ema_decay: Optional[float] = None,
        seed: int = 0,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 0,
        log_every: int = 50,
        log_fn=print,
    ):
        self.config = config
        self.mesh = mesh if mesh is not None else spmd.make_mesh(
            data=len(jax.devices()), model=1
        )
        self.optimizer = optimizer
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.log_every = log_every
        self.log_fn = log_fn
        self.step_idx = 0
        # Most recent step's loss; None until a step has actually run (an
        # empty/exhausted dataset must not leave the attribute unset).
        self.last_loss: Optional[float] = None

        if schedule is not None:
            if optimizer != "adamw":
                raise ValueError(
                    "lr schedules ride optax's step count; use "
                    "optimizer='adamw' (sgd here is the stateless step)"
                )
            import optax

            if schedule == "cosine":
                if not total_steps:
                    raise ValueError("schedule='cosine' needs total_steps")
                lr = optax.warmup_cosine_decay_schedule(
                    0.0, lr, warmup_steps, total_steps)
            elif schedule == "constant":
                lr = optax.linear_schedule(
                    0.0, lr, warmup_steps) if warmup_steps else lr
            else:
                raise ValueError(f"unknown schedule {schedule!r}")

        # Device-measured launch knobs for the training kernels — the same
        # perf/autotune cache the inference engine consults. Pass explicit
        # ``tuning`` knobs, or a GLOBAL ``batch_size`` hint for an automatic
        # lookup (keyed per-device, quant="train"; lookup falls back to the
        # same-shape inference entry when no training sweep was recorded,
        # so inference attention_ipc winners carry over to the forward).
        if tuning is None and batch_size:
            from .perf import autotune

            per_dev = max(1, int(batch_size) // int(self.mesh.devices.size))
            tuning = autotune.lookup(
                config, per_dev, compute_dtype, quant="train",
                path=tuning_path)
        self.tuning = tuning or {}

        self._split_mode = attention_impl.startswith("split:")
        if self._split_mode:
            # "split:<backward>[:<layers_per_program>]" — the program-split
            # host-loop step (parallel/split_step): per-layer(-stage)
            # compiled programs for compile-limited targets; the route that
            # trains ViT-G/14 (1.84B) on one chip. Stateless-SGD only, and
            # single-device (its programs carry no GSPMD shardings).
            from .parallel import split_step as split_mod

            if optimizer != "sgd" or grad_accum != 1:
                raise ValueError(
                    "split-step training is the stateless SGD path: "
                    "optimizer='sgd', grad_accum=1")
            if self.mesh.devices.size != 1:
                raise ValueError(
                    "split-step training is single-device; use "
                    "attention_impl='flash'/'fused' on a multi-chip mesh")
            parts = attention_impl.split(":")
            made = split_mod.make_split_train_step(
                config, lr=lr, compute_dtype=compute_dtype,
                layers_per_program=int(parts[2]) if len(parts) > 2 else 1,
                label_smoothing=label_smoothing,
                grad_clip_norm=grad_clip_norm, backward=parts[1],
                tuning=self.tuning,
            )
        else:
            # scan_unroll=depth is the relay-compile dodge for D>=768
            # grad-through-scan programs (BENCH.md round 3) — plumbed
            # through so Trainer reaches big widths on tunneled targets.
            made = spmd.make_train_step(
                config, self.mesh, lr=lr, compute_dtype=compute_dtype,
                optimizer=optimizer, weight_decay=weight_decay,
                attention_impl=attention_impl, grad_accum=grad_accum,
                scan_unroll=scan_unroll, grad_clip_norm=grad_clip_norm,
                label_smoothing=label_smoothing, tuning=self.tuning,
            )
        if optimizer == "sgd":
            self._init_opt, self._step = None, made
        else:
            self._init_opt, self._step = made

        # Device-side input pipeline, fused into the step's jit instead of
        # costing host producer time (the host pipeline is ~4 ms/img of
        # GIL-bound NumPy — it starves every config on a small host;
        # BENCH.md round 5):
        #   ``device_augment``: kwargs for augment_device.device_augment
        #     (RRC+flip+RandAugment+normalize on chip) — feed RAW uint8 HWC
        #     batches (augment_device.raw_batches); img_size defaults to
        #     the model's. Sequence kwargs must be tuples (they are jit
        #     statics).
        #   ``mixup``: kwargs for augment.device_mixup_cutmix
        #     (mixup_alpha/cutmix_alpha/prob/switch_prob) — pair with a
        #     dataset yielding INT labels (augmented_dataset(mix="device"),
        #     raw_batches, or data.memory_dataset).
        # Either, or both (augment runs first); one fused program with the
        # step. An optional "seed" in either dict overrides the RNG seed.
        self._mix_step = None
        if mixup is not None or device_augment is not None:
            from . import augment as augment_mod
            from . import augment_device as aug_dev_mod

            mix_kw = dict(mixup) if mixup is not None else None
            aug_kw = dict(device_augment) if device_augment is not None \
                else None
            key_seed = seed + 101
            for kw in (aug_kw, mix_kw):
                if kw is not None:
                    key_seed = kw.pop("seed", key_seed)
            if aug_kw is not None:
                aug_kw.setdefault("img_size", config.img_size)
            base_key = jax.random.key(key_seed)
            nc = config.num_classes
            inner = self._step

            def _prep(images, labels, step_i):
                k = jax.random.fold_in(base_key, step_i)
                k_aug, k_mix = jax.random.split(k)
                if aug_kw is not None:
                    images = aug_dev_mod.device_augment(
                        images, k_aug, **aug_kw)
                if mix_kw is not None:
                    return augment_mod.device_mixup_cutmix(
                        k_mix, images, labels, nc, **mix_kw)
                return images, labels

            if self._split_mode:
                # The host-loop step is not jittable as a whole; prep in a
                # separate small jit, then run the split step on the result.
                _prep_jit = jax.jit(_prep)

                def _mix_step(params, images, labels, step_i):
                    mixed, soft = _prep_jit(images, labels, step_i)
                    return inner(params, mixed, soft)
            elif self._init_opt is None:

                @jax.jit
                def _mix_step(params, images, labels, step_i):
                    mixed, soft = _prep(images, labels, step_i)
                    return inner(params, mixed, soft)
            else:

                @jax.jit
                def _mix_step(params, opt_state, images, labels, step_i):
                    mixed, soft = _prep(images, labels, step_i)
                    return inner(params, opt_state, mixed, soft)

            self._mix_step = _mix_step

        self.params = spmd.shard_params_gspmd(
            vit.init_params(config, seed=seed), self.mesh, config
        )
        self.opt_state = (
            self._init_opt(self.params) if self._init_opt else None
        )

        # EMA shadow weights (timm-style; the eval/export weights of the
        # standard ViT recipe). None unless ema_decay is set.
        self.ema_decay = ema_decay
        self.ema_params = None
        if ema_decay is not None:
            if not 0.0 < ema_decay < 1.0:
                raise ValueError(f"ema_decay must be in (0, 1), got "
                                 f"{ema_decay}")
            self.ema_params = _f32_shadow(self.params)

            @jax.jit
            def _ema_update(ema, params):
                d = jnp.float32(ema_decay)
                return jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p.astype(jnp.float32)
                    if jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating)
                    else p,
                    ema, params,
                )

            self._ema_update = _ema_update

    # -- checkpointing ----------------------------------------------------

    def _ckpt_path(self, step: int) -> str:
        return os.path.join(self.checkpoint_dir, f"step_{step:08d}")

    def save(self) -> str:
        """Write params (+ opt state) under ``checkpoint_dir/step_NNNNNNNN``."""
        if not self.checkpoint_dir:
            raise ValueError("Trainer built without checkpoint_dir")
        tree = {"params": self.params, "step": np.int64(self.step_idx)}
        if self.opt_state is not None:
            tree["opt_state"] = self.opt_state
        if self.ema_params is not None:
            tree["ema_params"] = self.ema_params
        path = self._ckpt_path(self.step_idx)
        ckpt_io.save_checkpoint(path, tree)
        return path

    def latest_checkpoint(self) -> Optional[str]:
        if not self.checkpoint_dir or not os.path.isdir(self.checkpoint_dir):
            return None
        steps = [int(m.group(1)) for e in os.listdir(self.checkpoint_dir)
                 if (m := _STEP_RE.match(e))]
        return self._ckpt_path(max(steps)) if steps else None

    def resume(self) -> bool:
        """Load the newest checkpoint if one exists. Returns True if so.

        The restore template is adapted to the checkpoint's ACTUAL structure
        (``io.checkpoint.checkpoint_structure`` — Orbax restores are
        structure-strict in both directions), so a run survives setting
        changes across restarts: EMA on/off (the shadow is seeded from the
        restored params when the checkpoint has none), and opt_state
        structure drift (e.g. toggling ``grad_clip_norm`` wraps adamw in an
        ``optax.chain`` whose state pytree differs) — the optimizer state
        restarts from scratch with a logged warning rather than crashing.
        """
        path = self.latest_checkpoint()
        if path is None:
            return False
        structure = ckpt_io.checkpoint_structure(path)
        restored_opt = False
        if structure is None:
            # Metadata unreadable (older orbax layout / foreign checkpoint):
            # the legacy EMA-presence flip-retry is the only recourse.
            like = {"params": self.params, "step": np.int64(0)}
            if self.opt_state is not None:
                like["opt_state"] = self.opt_state
            if self.ema_params is not None:
                like["ema_params"] = self.ema_params
            try:
                tree = ckpt_io.load_checkpoint(path, like)
            except ValueError:
                flipped = dict(like)
                if "ema_params" in flipped:
                    del flipped["ema_params"]
                else:
                    flipped["ema_params"] = self.params
                tree = ckpt_io.load_checkpoint(path, flipped)
            restored_opt = tree.get("opt_state") is not None
        else:
            like = {"params": self.params, "step": np.int64(0)}
            if "opt_state" in structure:
                # Restore the stored opt_state only when this Trainer can
                # use it; structure-strictness forces restoring SOMETHING
                # for the key either way (abstract, then discarded).
                if self.opt_state is not None:
                    like["opt_state"] = self.opt_state
                    restored_opt = True
                else:
                    like["opt_state"] = _abstract_like(structure["opt_state"])
            if "ema_params" in structure:
                like["ema_params"] = _abstract_like(structure["ema_params"])
            try:
                tree = ckpt_io.load_checkpoint(path, like)
            except ValueError:
                if not restored_opt:
                    raise  # not an opt_state mismatch — genuine failure
                self.log_fn(
                    f"resume: opt_state in {path} does not match this "
                    "Trainer's optimizer settings (e.g. grad_clip_norm "
                    "changed); restarting optimizer state from scratch"
                )
                like["opt_state"] = _abstract_like(structure["opt_state"])
                restored_opt = False
                tree = ckpt_io.load_checkpoint(path, like)
        self.params = tree["params"]
        if self.opt_state is not None:
            self.opt_state = (tree["opt_state"] if restored_opt
                              else self._init_opt(self.params))
        if self.ema_params is not None:
            # EMA requested: seed from the checkpoint's shadow if it has
            # one, else restart the average from the restored params.
            ema = tree.get("ema_params")
            self.ema_params = _f32_shadow(
                ema if ema is not None else self.params)
        self.step_idx = int(tree["step"])
        return True

    def export_reference(self, directory: str, *, use_ema: bool = False):
        """Write the trained weights as a reference-format checkpoint
        (``Weight_<idx>_<name>.bin`` directory) loadable by the CLI/engine
        and the reference comparator path. ``use_ema`` exports the EMA
        shadow weights instead (the standard ViT eval weights)."""
        from .io.export import export_weights

        src = self.ema_params if use_ema else self.params
        if use_ema and src is None:
            raise ValueError("use_ema=True but Trainer has no ema_decay")
        named = vit.unstack_params(
            jax.tree.map(np.asarray, src), self.config)
        return export_weights(named, directory, self.config)

    # -- the loop ---------------------------------------------------------

    def fit(self, batches: Iterable, *, steps: Optional[int] = None,
            prefetch: int = 2):
        """Run ``steps`` updates (or until ``batches`` is exhausted).
        Returns the final params pytree."""
        data_sharding = NamedSharding(self.mesh, P("data"))
        loader = DevicePrefetcher(
            batches, buffer_size=prefetch, sharding=data_sharding
        )
        loss = None
        imgs_done = 0
        t0 = time.perf_counter()
        try:
            for images, labels in loader:
                if steps is not None and self.step_idx >= steps:
                    break
                use_mix = (
                    self._mix_step is not None
                    and labels is not None and labels.ndim == 1
                )
                if self.opt_state is None:
                    if use_mix:
                        self.params, loss = self._mix_step(
                            self.params, images, labels, self.step_idx)
                    else:
                        self.params, loss = self._step(
                            self.params, images, labels)
                else:
                    if use_mix:
                        self.params, self.opt_state, loss = self._mix_step(
                            self.params, self.opt_state, images, labels,
                            self.step_idx)
                    else:
                        self.params, self.opt_state, loss = self._step(
                            self.params, self.opt_state, images, labels)
                self.step_idx += 1
                if self.ema_params is not None:
                    self.ema_params = self._ema_update(
                        self.ema_params, self.params)
                imgs_done += images.shape[0]
                if self.log_every and self.step_idx % self.log_every == 0:
                    l = float(np.asarray(loss))  # host fetch = sync point
                    dt = time.perf_counter() - t0
                    self.log_fn(
                        f"step {self.step_idx}: loss {l:.4f}, "
                        f"{imgs_done / dt:.0f} img/s"
                    )
                    imgs_done, t0 = 0, time.perf_counter()
                if (self.checkpoint_every and self.checkpoint_dir
                        and self.step_idx % self.checkpoint_every == 0):
                    self.save()
        finally:
            loader.close()
        if loss is not None:
            self.last_loss = float(np.asarray(loss))
        return self.params
