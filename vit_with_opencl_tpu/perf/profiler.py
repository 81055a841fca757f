"""Per-op profiling and throughput reporting.

The reference carries an event-profiling scaffold — queues created with
``CL_QUEUE_PROFILING_ENABLE``, per-kernel start/end accumulation and a
totals/averages report — that is entirely commented out
(reference: ViT_opencl.c:988-1048; call sites :402,477-479,611-615,966).
This module restores that capability TPU-style:

  * ``profile_ops``: times each pipeline stage (embed, LN, QKV, attention
    core, out-proj, MLP, head, softmax) as its own compiled program and
    reports the reference's totals/averages table shape;
  * ``trace``: context manager around ``jax.profiler`` for real XLA traces;
  * ``throughput_report``: images/sec + achieved TFLOP/s + roofline fraction
    (the reference's per-picture ``clock()`` prints, ViT_opencl.c:964,
    upgraded to MFU accounting).

Timing is fenced with a real device→host fetch: on some runtimes (the
tunneled axon platform) ``block_until_ready`` returns before execution
finishes, so every boundary here reads a scalar back.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
import time
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig
from ..models import vit

PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def _fence(x) -> None:
    """Force completion of everything enqueued before x (real host fetch)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


@dataclasses.dataclass
class OpProfile:
    """One pipeline stage's timing: per-call wall ms (for the whole batch)
    and how many times the op runs per image's forward pass."""

    name: str
    calls_per_image: int
    per_call_ms: float

    @property
    def per_image_total_ms(self) -> float:
        """Total ms this op contributes to one batch's forward pass."""
        return self.per_call_ms * self.calls_per_image


def _time_op(fn: Callable, args, iters: int) -> float:
    """Median-of-3 wall time for `iters` queued executions, fetch-fenced."""
    out = fn(*args)
    _fence(out)  # compile + warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fence(out)
        samples.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(samples))


def profile_ops(
    config: ViTConfig,
    params: Dict[str, Any],
    images: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    attention_impl: str = "xla",
    iters: int = 10,
) -> List[OpProfile]:
    """Stage-by-stage timing of the forward pipeline (one compiled program
    per stage, batch taken from ``images``)."""
    kernels = vit.resolve_kernels(attention_impl)
    b = images.shape[0]
    t, d, nh, hd = (config.num_tokens, config.embed_dim, config.num_heads,
                    config.head_dim)
    lp0 = jax.tree.map(lambda a: a[0], params["layers"])

    x = jax.jit(
        lambda im, p: vit.embed(im, p, config, compute_dtype)
    )(images, params)
    _fence(x)
    qkv = jax.jit(
        lambda h, lp: kernels["matmul"](h, lp["qkv_w"], lp["qkv_b"])
        .reshape(b, t, 3, nh, hd)
        .transpose(2, 0, 3, 1, 4)
    )(x, lp0)
    _fence(qkv)
    ctx = jax.jit(
        lambda q: kernels["attention"](q[0], q[1], q[2], config)
    )(qkv)
    _fence(ctx)
    hid = jax.jit(
        lambda h, lp: kernels["matmul_gelu"](h, lp["fc1_w"], lp["fc1_b"], config)
    )(x, lp0)
    _fence(hid)

    stages: List[OpProfile] = []

    def add(name, fn, args, calls_per_image: int):
        ms = _time_op(jax.jit(fn), args, iters)
        stages.append(OpProfile(name, calls_per_image, ms / iters))

    L = config.depth
    add("patch_embed(+cls+pos)",
        lambda im, p: vit.embed(im, p, config, compute_dtype),
        (images, params), 1)
    add("layer_norm",
        lambda h, lp: kernels["layer_norm"](h, lp["ln1_w"], lp["ln1_b"], config.eps),
        (x, lp0), 2 * L + 1)
    add("qkv_proj",
        lambda h, lp: kernels["matmul"](h, lp["qkv_w"], lp["qkv_b"]),
        (x, lp0), L)
    if "attention_packed" in kernels:
        # Time the packed kernel the jit engine actually uses.
        qkv_packed = jax.jit(
            lambda h, lp: kernels["matmul"](h, lp["qkv_w"], lp["qkv_b"])
        )(x, lp0)
        _fence(qkv_packed)
        add("attention_core(packed)",
            lambda qk: kernels["attention_packed"](qk, config),
            (qkv_packed,), L)
    else:
        add("attention_core",
            lambda q: kernels["attention"](q[0], q[1], q[2], config),
            (qkv,), L)
    add("out_proj",
        lambda h, lp: kernels["matmul"](h, lp["out_w"], lp["out_b"]),
        (x, lp0), L)
    add("mlp_fc1_gelu",
        lambda h, lp: kernels["matmul_gelu"](h, lp["fc1_w"], lp["fc1_b"], config),
        (x, lp0), L)
    add("mlp_fc2",
        lambda h, lp: kernels["matmul"](h, lp["fc2_w"], lp["fc2_b"]),
        (hid, lp0), L)
    if config.head_type != "none":
        cls = x[:, 0]
        add("head+softmax",
            lambda c, p: jax.nn.softmax(
                jnp.dot(c.astype(p["head_w"].dtype), p["head_w"],
                        preferred_element_type=jnp.float32) + p["head_b"]
            ),
            (cls, params), 1)
    return stages


def format_profile(stages: List[OpProfile], batch: int) -> str:
    """The reference reporter's shape (per-op totals/averages). Per-call
    timings cover the whole batch; the total column is ms per batch."""
    lines = [
        f"{'op':<24}{'calls/img':>10}{'ms/call':>12}{'ms/batch total':>15}",
        "-" * 61,
    ]
    total = 0.0
    for s in stages:
        total += s.per_image_total_ms
        lines.append(
            f"{s.name:<24}{s.calls_per_image:>10}{s.per_call_ms:>12.3f}"
            f"{s.per_image_total_ms:>15.3f}"
        )
    lines.append("-" * 61)
    lines.append(f"{'sum (batch of ' + str(batch) + ')':<24}{'':>10}{'':>12}"
                 f"{total:>15.3f}")
    return "\n".join(lines)


def attribute_forward(
    config: ViTConfig,
    params: Dict[str, Any],
    images: jax.Array,
    *,
    compute_dtype=jnp.bfloat16,
    iters: int = 10,
    quant: "str | None" = None,
) -> Dict[str, float]:
    """Substitution-based attribution of the REAL fused forward pass.

    ``profile_ops`` times stages in isolation, which double-counts dispatch
    and HBM boundary traffic the fused model never pays. This measures the
    full jitted forward (flash/fused kernels), then re-times it with
    targeted substitutions compiled in — erf-GELU → identity, attention
    softmax → constant row scale (both GEMMs kept) — and attributes each
    component as the timing delta. The substituted programs produce WRONG
    outputs by construction; only wall clock is read.

    Returns ms/batch for: ``total``, ``gelu`` (share removed by identity
    GELU), ``softmax``, ``gemm_skeleton`` (both substitutions applied — the
    pure-GEMM bound of the kernel geometry), plus ``*_share`` fractions.

    ``quant="int8-w8a8"`` attributes the W8A8 path instead (``params`` must
    already be quantized): a third substitution replaces the per-row absmax
    quantization (``models/quant.quantize_act`` — the single implementation
    behind BOTH the fused kernel's ``_quantize_rows`` and the per-op
    ``matmul_w8a8`` path) with a bare fp32→int8 convert at a constant scale
    — same int8 GEMMs, none of the absmax reduce / scale / round VPU work —
    and its delta is returned as ``quantize_ms``/``quantize_share``. The
    W8A8 ``gemm_skeleton`` is then the pure int8-GEMM bound of the kernel
    geometry.

    The substitutions temporarily swap module-level kernels
    (``fused_block._gelu_fast``, ``attention._head_attention``) while the
    probe programs trace — any CONCURRENT trace in the same process (the
    serving daemon, a parallel profile) would silently compile the
    wrong-math substitutes into unrelated programs. A process-wide lock
    therefore guards this function and rejects re-entry instead of
    corrupting a bystander's compile.
    """
    if not _ATTRIBUTION_LOCK.acquire(blocking=False):
        raise RuntimeError(
            "attribute_forward is already running in this process; its "
            "kernel substitutions are process-global during tracing, so "
            "concurrent use would compile wrong-math kernels into other "
            "programs. Profile one model at a time."
        )
    try:
        kernels = vit.resolve_kernels("flash", w8a8=quant == "int8-w8a8")

        def timed(gelu_identity: bool, softmax_identity: bool,
                  quant_cheap: bool = False) -> float:
            with kernel_substitutions(gelu_identity, softmax_identity,
                                      quant_cheap):
                fwd = jax.jit(
                    lambda im, p: vit.forward(im, p, config,
                                              compute_dtype=compute_dtype,
                                              kernels=kernels)
                )
                return _time_op(fwd, (images, params), iters) / iters

        total = timed(False, False)
        no_gelu = timed(True, False)
        no_softmax = timed(False, True)
        if quant == "int8-w8a8":
            no_quant = timed(False, False, quant_cheap=True)
            skeleton = timed(True, True, quant_cheap=True)
        else:
            skeleton = timed(True, True)
        out = {
            "total_ms": total,
            "gelu_ms": max(0.0, total - no_gelu),
            "softmax_ms": max(0.0, total - no_softmax),
            "gemm_skeleton_ms": skeleton,
            "gelu_share": max(0.0, 1.0 - no_gelu / total),
            "softmax_share": max(0.0, 1.0 - no_softmax / total),
            "vpu_share": max(0.0, 1.0 - skeleton / total),
        }
        if quant == "int8-w8a8":
            out["quantize_ms"] = max(0.0, total - no_quant)
            out["quantize_share"] = max(0.0, 1.0 - no_quant / total)
        return out
    finally:
        _ATTRIBUTION_LOCK.release()


# Guards attribute_forward's process-global kernel substitutions.
_ATTRIBUTION_LOCK = threading.Lock()


@contextlib.contextmanager
def kernel_substitutions(gelu_identity: bool, softmax_identity: bool,
                         quant_cheap: bool = False):
    """The probe's kernel substitutions, as a reusable (and testable)
    context: while active, any program TRACED computes wrong math but the
    identical GEMM sequence. Every bound claim in BENCH.md routes through
    these three swaps; tests/test_perf.py pins that each one preserves
    output shapes/dtypes and the forward's dot_general count.

    - ``gelu_identity``  — fused_block._gelu_fast → identity (removes the
      erf/tanh VPU work, keeps both MLP GEMMs).
    - ``softmax_identity`` — attention._head_attention → QK^T and SV GEMMs
      with a constant row scale instead of the online softmax.
    - ``quant_cheap``    — quant.quantize_act → bare int8 convert at a
      constant scale (same int8 GEMMs, no absmax/round VPU passes); covers
      BOTH the fused kernel's _quantize_rows and the per-op matmul_w8a8.
    """
    from ..models import quant as quant_mod
    from ..ops import attention as attn_mod
    from ..ops import fused_block

    real_gelu = fused_block._gelu_fast
    real_head = attn_mod._head_attention
    real_quant = quant_mod.quantize_act
    if gelu_identity:
        fused_block._gelu_fast = lambda v: v
    if quant_cheap:
        quant_mod.quantize_act = lambda hf: (
            hf.astype(jnp.int8),
            jnp.full_like(hf[..., :1].astype(jnp.float32), 1.0))
    if softmax_identity:
        def fake_head(q, k, v, scale, neg=None):
            qs = q * jnp.asarray(scale, q.dtype)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = jax.lax.dot(
                (s * (1.0 / s.shape[1])).astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            )
            return o, s

        attn_mod._head_attention = fake_head
    try:
        yield
    finally:
        fused_block._gelu_fast = real_gelu
        attn_mod._head_attention = real_head
        quant_mod.quantize_act = real_quant


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """XLA profiler trace around a block (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def throughput_report(
    config: ViTConfig,
    batch: int,
    elapsed_s: float,
    iters: int,
    *,
    tpu_gen: str = "v5e",
) -> Dict[str, float]:
    imgs_per_sec = batch * iters / elapsed_s
    gflop = config.flops_per_image / 1e9
    achieved_tflops = imgs_per_sec * gflop / 1e3
    peak = PEAK_BF16_TFLOPS.get(tpu_gen, 197.0)
    return {
        "images_per_sec": imgs_per_sec,
        "gflop_per_image": gflop,
        "achieved_tflops": achieved_tflops,
        "mfu": achieved_tflops / peak,
        "roofline_images_per_sec": peak * 1e3 / gflop,
    }
