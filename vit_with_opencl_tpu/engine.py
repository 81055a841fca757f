"""Jit-compiled batched inference engine.

This layer replaces the reference's hand-built concurrency machinery — five
out-of-order OpenCL queues, the ``cl_event`` dependency DAG, per-image buffer
sets with async-callback cleanup, pipelined weight upload, ping-pong encoder
buffers (reference: ViT_opencl.c:107-114, 333-357, 845-861, 916-965) — with
what XLA gives natively:

  * weights live in HBM once (``jax.device_put`` at construction — the
    reference's ``fillLoadedOnceWeight``/``fillEncoderWeight`` upload phase);
  * the whole forward pass is one compiled program; dataflow, fusion and
    scheduling replace the event graph;
  * images are batched (``vmap`` is implicit in batched ops) instead of
    pipelined one-by-one;
  * dispatch is async — the host enqueues every batch before blocking on
    results, overlapping host-side feeding with device compute, the same
    *effect* as the reference's never-blocking enqueue loop
    (ViT_opencl.c:926-965).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import ViTConfig
from .models import vit


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated CLI/daemon
    startups skip XLA recompiles (the reference pays its program build on
    every run — ViT_opencl.c:832-906; we don't have to)."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "vit_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never fail startup over it


def resolve_quantize(quantize: Optional[str], config: ViTConfig,
                     *, calibrated: bool = False) -> Optional[str]:
    """Resolve the ``"auto"`` quantize mode to a concrete one.

    Measured policy (BENCH.md round 3): W8A8 wins +37–45% wherever the
    fused-layer kernel is the production encoder path, but REGRESSES on the
    small stack-kernel-class models (ViT-Tiny −11%: they are VPU-bound, so
    the double-rate int8 MXU buys nothing and the per-token quantize only
    adds VPU work). "auto" therefore picks int8-w8a8 exactly when the
    config's bf16 production path is NOT the whole-encoder stack kernel.

    ``calibrated``: the caller supplied calibration images — the user is
    asking for the accuracy-defensible quantized mode, so "auto" picks
    int8-w8a8 (which the engine upgrades to the calibrated outlier-aware
    transform) even for the stack-class configs, where the outlier path
    routes per-layer.
    """
    if quantize != "auto":
        return quantize
    if calibrated:
        return "int8-w8a8"
    from .ops import fused_block

    if fused_block.supports_stack(config, dtype_bytes=2):
        return None
    return "int8-w8a8"


class InferenceEngine:
    """Compiled batched ViT inference on one device.

    Args:
      config: model architecture.
      named_params: {name: shaped numpy array} from ``io.binfmt.weights_to_dict``.
      batch_size: static batch the forward pass is compiled for. Inputs are
        padded to a multiple (excess rows discarded) — the reference instead
        hard-caps its pipeline at 100 in-flight images (ViT_opencl.c:107-114).
      param_dtype / compute_dtype: bf16 by default, fp32 for parity testing.
      attention_impl: 'xla' (einsum softmax chain) or 'flash' (Pallas kernel).
      device: target device; defaults to ``jax.devices()[0]``.
    """

    def __init__(
        self,
        config: ViTConfig,
        named_params: Dict[str, np.ndarray],
        *,
        batch_size: int = 32,
        param_dtype: jnp.dtype = jnp.bfloat16,
        compute_dtype: jnp.dtype = jnp.bfloat16,
        attention_impl: str = "xla",
        device: Optional[Any] = None,
        check_numerics: bool = False,
        quantize: Optional[str] = None,
        normalize_uint8: bool = False,
        tuning_path: Optional[str] = None,
        calibrate: Optional[np.ndarray] = None,
    ):
        self.config = config
        self.batch_size = int(batch_size)
        self.compute_dtype = compute_dtype
        self.device = device if device is not None else jax.devices()[0]
        quantize = resolve_quantize(quantize, config,
                                    calibrated=calibrate is not None)
        self.quantize = quantize
        t0 = time.perf_counter()
        params = vit.stack_params(named_params, config, param_dtype=param_dtype)
        if quantize in ("int8", "int8-w8a8"):
            # Weight-only int8 (models/quant.py): halves weight HBM footprint
            # and upload traffic; compute stays on the bf16 MXU. "int8-w8a8"
            # additionally quantizes activations per token at runtime so the
            # encoder's big GEMMs run int8xint8 on the MXU's double-rate int
            # path (measured 1.79x bf16, scripts/probe_int8.py).
            from .models import quant

            if calibrate is not None and quantize == "int8-w8a8":
                # Outlier-aware W8A8: calibrate per-channel activation
                # absmax on the given images, permute the hot channels into
                # tile-aligned groups and keep them bf16 (exact) while the
                # rest runs dynamic int8. Trained-net outlier channels
                # otherwise pollute every per-token scale
                # (tests/test_quant_outlier.py records the damage).
                params = quant.calibrate_w8a8(
                    np.asarray(calibrate, np.float32), params, config)
            else:
                params = quant.quantize_stacked_params(params, config)
        elif calibrate is not None:
            raise ValueError(
                "calibrate= images are only meaningful with "
                "quantize='int8-w8a8' (outlier-aware activation quantization)")
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.params = jax.device_put(params, self.device)
        # Device-measured launch knobs (perf/autotune cache, keyed on
        # config/batch/dtype) override the kernels' shipped heuristics —
        # the tuned-literals role of the reference's hand-picked dispatch
        # sizes (ViT_opencl.c:510,591,648), measured instead of guessed.
        from .perf import autotune

        self.tuning = autotune.lookup(
            config, self.batch_size, compute_dtype, path=tuning_path,
            quant=quantize,
        )
        kernels = vit.resolve_kernels(attention_impl, tuning=self.tuning,
                                      w8a8=quantize == "int8-w8a8",
                                      heads=(config.num_heads, config.head_dim))

        self.normalize_uint8 = normalize_uint8
        if normalize_uint8:
            # Accept raw uint8 images and normalize ON DEVICE (ImageNet
            # mean/std): 4x less host->device transfer than fp32 inputs —
            # the production input path (io/preprocess still handles
            # resize/crop on host).
            from .io.preprocess import uint8_normalize_constants

            mean, inv_std = uint8_normalize_constants()

        @functools.partial(jax.jit, static_argnames=())
        def _forward(images, params):
            if normalize_uint8:
                images = (images.astype(jnp.float32) - mean) * inv_std
            return vit.forward(
                images, params, config, compute_dtype=compute_dtype, kernels=kernels
            )

        if check_numerics:
            # NaN guard (the reference's findNaN, ViT_opencl.c:1050-1061, as
            # an always-on option instead of commented-out call sites).
            from .debug import checked_forward

            _forward = checked_forward(_forward, what=f"{config.name} forward")
        self._forward = _forward
        self.setup_time = time.perf_counter() - t0

    def warmup(self) -> float:
        """Trigger compilation (the reference's program-build phase,
        ViT_opencl.c:832-906); returns compile wall-time in seconds."""
        t0 = time.perf_counter()
        dummy = jnp.zeros(
            (self.batch_size, self.config.in_chans, self.config.img_size,
             self.config.img_size),
            jnp.uint8 if self.normalize_uint8 else jnp.float32,
        )
        out = self._forward(jax.device_put(dummy, self.device), self.params)
        # Fence with a real host fetch: on some runtimes (the tunneled axon
        # platform) block_until_ready returns before execution completes.
        np.asarray(out.ravel()[:1])
        return time.perf_counter() - t0

    def run(self, images: np.ndarray) -> np.ndarray:
        """All-images inference → probabilities [n, num_classes] (fp32 numpy).

        Enqueues every batch asynchronously before gathering — host feed
        overlaps device compute (the reference's inter-image pipelining
        effect, ViT_opencl.c:926-965).
        """
        images = np.asarray(images)
        in_dtype = np.uint8 if self.normalize_uint8 else np.float32
        if self.normalize_uint8 and images.dtype != np.uint8:
            raise ValueError(
                f"engine was built with normalize_uint8=True and expects raw "
                f"uint8 pixels, got {images.dtype} (silently truncating "
                f"normalized floats would corrupt the input)"
            )
        if not self.normalize_uint8 and images.dtype == np.uint8:
            raise ValueError(
                "got raw uint8 pixels but the engine expects normalized "
                "float32 inputs; preprocess first or build the engine with "
                "normalize_uint8=True"
            )
        images = np.asarray(images, in_dtype)
        if images.ndim == 3:
            images = images[None]
        n = images.shape[0]
        if n == 0:
            return np.zeros((0, self.config.num_classes), np.float32)
        bs = self.batch_size
        outputs = []
        for start in range(0, n, bs):
            chunk = images[start : start + bs]
            if chunk.shape[0] < bs:
                pad = np.zeros((bs - chunk.shape[0],) + chunk.shape[1:], in_dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            dev_chunk = jax.device_put(jnp.asarray(chunk), self.device)
            outputs.append(self._forward(dev_chunk, self.params))
        # Gather (single sync point).
        probs = np.concatenate([np.asarray(o) for o in outputs], axis=0)
        return probs[:n]

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return self.run(images)


class DataParallelEngine:
    """Batched inference data-parallel over a device mesh.

    Same ``run``/``warmup``/``batch_size`` surface as ``InferenceEngine`` so
    the serving batcher can fan a coalesced batch out across every chip
    (``parallel.spmd.dp_forward_fn``: batch sharded over the mesh, params
    replicated, zero per-step communication). ``batch_size`` is GLOBAL and
    must divide by the device count.
    """

    def __init__(
        self,
        config: ViTConfig,
        named_params: Dict[str, np.ndarray],
        *,
        batch_size: int = 32,
        devices: Optional[Any] = None,
        param_dtype: jnp.dtype = jnp.bfloat16,
        compute_dtype: jnp.dtype = jnp.bfloat16,
        attention_impl: str = "flash",
        quantize: Optional[str] = None,
        normalize_uint8: bool = False,
        tuning_path: Optional[str] = None,
        calibrate: Optional[np.ndarray] = None,
    ):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import spmd

        devices = list(devices if devices is not None else jax.devices())
        self.n_devices = len(devices)
        self.config = config
        self.batch_size = int(batch_size)
        if self.batch_size % self.n_devices:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{self.n_devices} devices"
            )
        quantize = resolve_quantize(quantize, config,
                                    calibrated=calibrate is not None)
        self.quantize = quantize
        t0 = time.perf_counter()
        self.mesh = spmd.make_mesh(data=self.n_devices, model=1,
                                   devices=devices)
        params = vit.stack_params(named_params, config, param_dtype=param_dtype)
        if quantize in ("int8", "int8-w8a8"):
            from .models import quant

            if calibrate is not None and quantize == "int8-w8a8":
                # Outlier-aware W8A8 (same transform as the single-device
                # engine); the result replicates over the mesh like any
                # other param pytree.
                params = quant.calibrate_w8a8(
                    np.asarray(calibrate, np.float32), params, config)
            else:
                params = quant.quantize_stacked_params(params, config)
        elif calibrate is not None:
            raise ValueError(
                "calibrate= images are only meaningful with "
                "quantize='int8-w8a8' (outlier-aware activation quantization)")
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        replicated = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, replicated)
        from .perf import autotune

        tuning = autotune.lookup(config, self.batch_size // self.n_devices,
                                 compute_dtype, path=tuning_path,
                                 quant=quantize)
        kernels = vit.resolve_kernels(attention_impl, tuning=tuning,
                                      w8a8=quantize == "int8-w8a8",
                                      heads=(config.num_heads, config.head_dim))
        self._data_sharding = NamedSharding(self.mesh, P(("data", "model")))

        self.normalize_uint8 = normalize_uint8
        if normalize_uint8:
            # Raw uint8 pixels over the wire + host->device, normalized on
            # each data shard (same 4x transfer saving as the single-device
            # engine — round-2 verdict item 7: the DP path lost it).
            from .io.preprocess import uint8_normalize_constants

            mean, inv_std = uint8_normalize_constants()

        @jax.jit
        def _forward(images, params):
            images = jax.lax.with_sharding_constraint(
                images, self._data_sharding
            )
            if normalize_uint8:
                images = (images.astype(jnp.float32) - mean) * inv_std
            return vit.forward(images, params, config,
                               compute_dtype=compute_dtype, kernels=kernels)

        self._forward = _forward
        self.setup_time = time.perf_counter() - t0

    def warmup(self) -> float:
        t0 = time.perf_counter()
        dummy = jnp.zeros(
            (self.batch_size, self.config.in_chans, self.config.img_size,
             self.config.img_size),
            jnp.uint8 if self.normalize_uint8 else jnp.float32,
        )
        out = self._forward(jax.device_put(dummy, self._data_sharding),
                            self.params)
        np.asarray(out.ravel()[:1])
        return time.perf_counter() - t0

    def run(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images)
        in_dtype = np.uint8 if self.normalize_uint8 else np.float32
        if self.normalize_uint8 and images.dtype != np.uint8:
            raise ValueError(
                f"engine was built with normalize_uint8=True and expects raw "
                f"uint8 pixels, got {images.dtype} (silently truncating "
                f"normalized floats would corrupt the input)"
            )
        if not self.normalize_uint8 and images.dtype == np.uint8:
            raise ValueError(
                "got raw uint8 pixels but the engine expects normalized "
                "float32 inputs; preprocess first or build the engine with "
                "normalize_uint8=True"
            )
        images = np.asarray(images, in_dtype)
        if images.ndim == 3:
            images = images[None]
        n = images.shape[0]
        if n == 0:
            return np.zeros((0, self.config.num_classes), np.float32)
        bs = self.batch_size
        outputs = []
        for start in range(0, n, bs):
            chunk = images[start:start + bs]
            if chunk.shape[0] < bs:
                pad = np.zeros((bs - chunk.shape[0],) + chunk.shape[1:],
                               in_dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            dev = jax.device_put(jnp.asarray(chunk), self._data_sharding)
            outputs.append(self._forward(dev, self.params))
        probs = np.concatenate([np.asarray(o) for o in outputs], axis=0)
        return probs[:n]

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return self.run(images)
