"""Kernel autotuning: measure candidate launch configs on the real device.

The reference hard-codes its tile sizes and pipeline depth as literals
(ViT_opencl.c:510,591,648,916 — tuned by hand for one GPU). Here tunable
knobs (attention images-per-cell, GEMM block shapes) get swept on the actual
chip with fetch-fenced timing, and the winner can be cached per
(config, batch, dtype) key.

Defaults shipped in ops/ were chosen with this harness on v5e; rerun on new
hardware generations.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ViTConfig


def _fence(x) -> None:
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def time_fn(fn: Callable, args: tuple, iters: int = 20) -> float:
    """Best-of-3 mean ms per call, fetch-fenced (see perf.profiler)."""
    out = fn(*args)
    _fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fence(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def sweep(
    candidates: Iterable,
    build: Callable[[object], Callable],
    args: tuple,
    *,
    iters: int = 20,
    timer: Optional[Callable] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[object, Dict]:
    """Time ``build(candidate)`` for each candidate; return (best, table).

    Candidates whose build/compile/run fails (e.g. VMEM OOM) are recorded as
    inf and skipped — an OOM config is a data point, not an error.

    ``prior``: already-measured {candidate: ms} carried over from an earlier
    partial run — those candidates are skipped. ``budget``: a mutable
    one-element list counting remaining NEW measurements this invocation may
    take (shared across knobs by ``tune_and_save --points``); when it runs
    out mid-sweep, the partial table is returned with best=None so repeated
    short windows accumulate toward a complete sweep. ``on_point``: called
    with the table after EVERY new measurement — tune_and_save uses it to
    write through to the cache so a killed run (timeout on a big-config
    compile, round 4) loses nothing already measured.
    """
    timer = timer or time_fn
    candidates = list(candidates)
    if not candidates:
        raise ValueError("no candidates to sweep (e.g. none divides the batch)")
    table: Dict = dict(prior) if prior else {}
    for cand in candidates:
        if cand in table:
            continue
        if budget is not None:
            if budget[0] <= 0:
                return None, table  # out of measurements: partial
            budget[0] -= 1
        try:
            fn = build(cand)
            table[cand] = timer(fn, args, iters)
        except Exception:  # noqa: BLE001 — OOM/compile failures expected
            table[cand] = float("inf")
        if on_point is not None:
            on_point(table)
    best = min(table, key=table.get)
    if table[best] == float("inf"):
        raise RuntimeError(f"every candidate failed: {table}")
    return best, table


def tune_attention_ipc(
    config: ViTConfig,
    batch: int,
    *,
    dtype=jnp.bfloat16,
    candidates: Sequence[int] = (1, 2, 4, 8),
    iters: int = 20,
    timer: Optional[Callable] = None,
    qkv: Optional[jax.Array] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[int, Dict[int, float]]:
    """Sweep images-per-cell for the packed attention kernel on this device."""
    from ..ops.attention import packed_fused_attention

    if qkv is None:
        d = config.embed_dim
        i = jax.lax.broadcasted_iota(
            jnp.int32, (batch * config.num_tokens * 3 * d, 1), 0
        )[:, 0]
        v = (((i * 16807) % 1021).astype(jnp.float32) / 1021.0 - 0.5)
        qkv = v.reshape(batch, config.num_tokens, 3 * d).astype(dtype)

    def build(ipc):
        return jax.jit(functools.partial(
            packed_fused_attention, config=config, images_per_cell=ipc,
        ))

    valid = [c for c in candidates if batch % c == 0]
    return sweep(valid, build, (qkv,), iters=iters, timer=timer,
                 prior=prior, budget=budget, on_point=on_point)


def tune_attention_bwd_ipc(
    config: ViTConfig,
    batch: int,
    *,
    dtype=jnp.bfloat16,
    candidates: Sequence[int] = (1, 2, 4, 8),
    iters: int = 20,
    timer: Optional[Callable] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[int, Dict[int, float]]:
    """Sweep images-per-cell for the packed attention BACKWARD kernel (the
    training path's rematerializing bwd, ops/attention.packed_attention_bwd).
    Its working set is ~2.3x the forward's, so the fwd winner does not
    transfer — this is its own cache key (``attention_bwd_ipc``), consumed
    by Trainer/make_train_step via the quant="train" tuning entry."""
    from ..ops.attention import packed_attention_bwd

    d = config.embed_dim
    t = config.num_tokens
    i = jax.lax.broadcasted_iota(
        jnp.int32, (batch * t * 4 * d, 1), 0)[:, 0]
    v = (((i * 16807) % 1021).astype(jnp.float32) / 1021.0 - 0.5)
    qkv = v[:batch * t * 3 * d].reshape(batch, t, 3 * d).astype(dtype)
    do = v[batch * t * 3 * d:].reshape(batch, t, d).astype(dtype)

    def build(ipc):
        return jax.jit(functools.partial(
            packed_attention_bwd, num_heads=config.num_heads,
            head_dim=config.head_dim, images_per_cell=ipc,
        ))

    valid = [c for c in candidates if batch % c == 0]
    return sweep(valid, build, (qkv, do), iters=iters, timer=timer,
                 prior=prior, budget=budget, on_point=on_point)


def tune_fused_block_ipc(
    config: ViTConfig,
    batch: int,
    *,
    dtype=jnp.bfloat16,
    candidates: Sequence[int] = (1, 2, 4, 8),
    iters: int = 20,
    timer: Optional[Callable] = None,
    quant: Optional[str] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[int, Dict[int, float]]:
    """Sweep images-per-cell for the whole-layer fused block on this device.

    ``quant`` ("int8" / "int8-w8a8") sweeps the QUANTIZED kernel variant —
    int8 weights halve resident VMEM, so its images-per-cell optimum can
    differ from the bf16 one.

    ipc=8 is excluded at embed_dim >= 1024: its unrolled kernel compiles
    for >9 minutes at ViT-L width on the relay (measured round 5, two
    timed-out 550 s windows) — past every safe tuning window, for a
    candidate that loses at ipc=4 already on these widths. The stack
    tuner excludes it everywhere for the same reason."""
    from ..models import vit
    from ..ops import fused_block

    if config.embed_dim >= 1024:
        candidates = [c for c in candidates if c <= 4]

    if quant:
        from ..models import quant as quantlib

        # One jit program: eager per-tensor quantize ops are ruinously slow
        # on the tunneled relay (one dispatch each — see CLAUDE.md).
        params = jax.jit(lambda: quantlib.quantize_stacked_params_device(
            vit.cheap_stacked_params(config, dtype), config))()
    else:
        params = jax.jit(
            lambda: vit.cheap_stacked_params(config, dtype))()
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    i = jax.lax.broadcasted_iota(
        jnp.int32, (batch * config.num_tokens * config.embed_dim, 1), 0
    )[:, 0]
    x = (((i * 48271) % 1021).astype(jnp.float32) / 1021.0 - 0.5).reshape(
        batch, config.num_tokens, config.embed_dim
    ).astype(dtype)

    def build(ipc):
        return jax.jit(functools.partial(
            fused_block.fused_encoder_layer, config=config,
            images_per_cell=ipc, w8a8=quant == "int8-w8a8",
        ))

    valid = [c for c in candidates if batch % c == 0]
    return sweep(valid, build, (x, lp), iters=iters, timer=timer,
                 prior=prior, budget=budget, on_point=on_point)


def tune_fused_stack_ipc(
    config: ViTConfig,
    batch: int,
    *,
    dtype=jnp.bfloat16,
    candidates: Sequence[int] = (2, 4),
    iters: int = 20,
    timer: Optional[Callable] = None,
    quant: Optional[str] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[int, Dict[int, float]]:
    """Sweep images-per-cell for the whole-ENCODER stack kernel — the
    production path for configs passing supports_stack. Separate from the
    per-layer sweep: their optima differ (stack flat-M GEMMs reward larger
    cells; ipc=8 is excluded because its unrolled kernel compiles for ~9
    minutes for a ~0% win)."""
    from ..models import vit
    from ..ops import fused_block

    if quant:
        from ..models import quant as quantlib

        params = jax.jit(lambda: quantlib.quantize_stacked_params_device(
            vit.cheap_stacked_params(config, dtype), config))()
    else:
        params = jax.jit(
            lambda: vit.cheap_stacked_params(config, dtype))()
    i = jax.lax.broadcasted_iota(
        jnp.int32, (batch * config.num_tokens * config.embed_dim, 1), 0
    )[:, 0]
    x = (((i * 48271) % 1021).astype(jnp.float32) / 1021.0 - 0.5).reshape(
        batch, config.num_tokens, config.embed_dim
    ).astype(dtype)

    def build(ipc):
        return jax.jit(functools.partial(
            fused_block.fused_encoder_stack, config=config,
            images_per_cell=ipc, w8a8=quant == "int8-w8a8",
        ))

    valid = [c for c in candidates if batch % c == 0]
    return sweep(valid, build, (x, params["layers"]), iters=iters,
                 timer=timer, prior=prior, budget=budget,
                 on_point=on_point)


def tune_ragged_route(
    config: ViTConfig,
    batch: int,
    *,
    dtype=jnp.bfloat16,
    iters: int = 20,
    timer: Optional[Callable] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[bool, Dict[bool, float]]:
    """Measure ragged (unpadded) vs padded packed-attention blocks for this
    exact (config, batch) instead of trusting the 2 MB knee heuristic
    (ops/attention.RAGGED_MAX_BLOCK_BYTES). An OOM on the ragged route is a
    data point (inf), not an error."""
    from ..ops.attention import packed_fused_attention

    d = config.embed_dim
    i = jax.lax.broadcasted_iota(
        jnp.int32, (batch * config.num_tokens * 3 * d, 1), 0
    )[:, 0]
    v = (((i * 16807) % 1021).astype(jnp.float32) / 1021.0 - 0.5)
    qkv = v.reshape(batch, config.num_tokens, 3 * d).astype(dtype)

    def build(ragged):
        return jax.jit(functools.partial(
            packed_fused_attention, config=config, ragged=ragged,
        ))

    return sweep([True, False], build, (qkv,), iters=iters, timer=timer,
                 prior=prior, budget=budget, on_point=on_point)


def tune_blockwise_blocks(
    seq_len: int,
    head_dim: int,
    *,
    batch_heads: int = 8,
    dtype=jnp.bfloat16,
    candidates: Sequence[Tuple[int, int]] = (
        (128, 128), (128, 256), (256, 256), (256, 512), (512, 512),
        (128, 512), (512, 256),
    ),
    iters: int = 10,
    timer: Optional[Callable] = None,
    prior: Optional[Dict] = None,
    budget: Optional[list] = None,
    on_point: Optional[Callable[[Dict], None]] = None,
) -> Tuple[Tuple[int, int], Dict]:
    """Sweep (block_q, block_k) for the long-sequence blockwise flash
    forward at a given sequence length — the knobs round 2 shipped as
    literals (DEFAULT_BLOCK_Q/K)."""
    from ..ops.attention import _blockwise_fwd_flat, _cdiv

    def mk(shape, salt):
        n = int(np.prod(shape))
        i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        v = (((i * 48271 + salt) % 1021).astype(jnp.float32) / 1021.0 - 0.5)
        return v.reshape(shape).astype(dtype)

    def build(bqk):
        bq, bk = bqk
        import math as _math

        lcm = bq * bk // _math.gcd(bq, bk)
        t_pad = _cdiv(seq_len, lcm) * lcm
        qf = mk((batch_heads, t_pad, head_dim), 1)
        kf = mk((batch_heads, t_pad, head_dim), 2)
        vf = mk((batch_heads, t_pad, head_dim), 3)

        def run():
            out, _ = _blockwise_fwd_flat(
                qf, kf, vf, scale=0.125, seq_len=seq_len, block_q=bq,
                block_k=bk, interpret=jax.default_backend() != "tpu",
                return_lse=False,
            )
            return out

        jitted = jax.jit(run)
        return lambda: jitted()

    valid = [c for c in candidates
             if c[0] <= seq_len and c[1] <= seq_len]
    return sweep(valid, build, (), iters=iters, timer=timer,
                 prior=prior, budget=budget, on_point=on_point)


def tune_fused_linear_blocks(
    m: int,
    k_dim: int,
    n_dim: int,
    *,
    dtype=jnp.bfloat16,
    candidates: Sequence[Tuple[int, int, int]] = (
        (256, 512, 512), (512, 512, 512), (256, 1024, 512),
        (512, 1024, 512), (256, 512, 1024), (128, 512, 512),
    ),
    iters: int = 10,
    timer: Optional[Callable] = None,
) -> Tuple[Tuple[int, int, int], Dict]:
    """Sweep (block_m, block_n, block_k) for ops/linear.fused_linear at a
    given GEMM shape (e.g. the flat [B*T, D] x [D, H] MLP)."""
    from ..ops import linear

    def mk(shape, salt):
        n = int(np.prod(shape))
        i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        v = (((i * 16807 + salt) % 1021).astype(jnp.float32) / 1021.0 - 0.5)
        return v.reshape(shape).astype(dtype)

    x = mk((m, k_dim), 1)
    w = mk((k_dim, n_dim), 2)
    b = mk((n_dim,), 3).astype(jnp.float32)

    interpret = jax.default_backend() != "tpu"

    def build(blocks):
        bm, bn, bk = blocks
        return jax.jit(functools.partial(
            linear.fused_linear, block_m=bm, block_n=bn, block_k=bk,
            interpret=interpret,
        ))

    return sweep(list(candidates), build, (x, w, b), iters=iters, timer=timer)


# ---------------------------------------------------------------------------
# Production tuning cache: the engine/daemon consult this per
# (config, batch, dtype) key and fall back to the shipped heuristics —
# replacing the reference's hand-tuned dispatch literals
# (ViT_opencl.c:510,591,648) with measured, persisted values.
# ---------------------------------------------------------------------------


def default_tuning_path() -> str:
    return os.environ.get(
        "VIT_TPU_TUNING",
        os.path.join(os.path.expanduser("~"), ".cache", "vit_tpu_tuning.json"),
    )


def tuning_key(config: ViTConfig, batch: int, dtype,
               quant: Optional[str] = None) -> str:
    base = f"{config.name}|b{int(batch)}|{jnp.dtype(dtype).name}"
    return f"{base}|{quant}" if quant else base


def lookup(config: ViTConfig, batch: int, dtype,
           path: str | os.PathLike | None = None,
           quant: Optional[str] = None) -> Dict:
    """Saved tuning for this (config, batch, dtype[, quant]), or {} if
    none/unreadable.

    A quantized engine asks with its quant mode; if no quant-specific sweep
    was recorded the bf16 entry is the fallback prior (same GEMM shapes,
    half the resident weight bytes — close, but sweep for exactness). The
    fallback is tagged ``"fallback_from": <base key>`` so callers and
    benchmark reports can tell a tuned-for-quant entry from a bf16 prior
    (the encoder ignores unknown keys, so the tag is inert downstream).

    Entries recorded on a different device than the current one are ignored
    — launch-config winners are hardware-specific, and a cache written on
    one backend (e.g. a CPU debug run) must not override another's
    heuristics. Best-effort: any malformed cache yields {}, never an error.
    """
    try:
        entry = load_tuning(path or default_tuning_path(),
                            tuning_key(config, batch, dtype, quant))
        if entry is None and quant:
            base_key = tuning_key(config, batch, dtype)
            entry = load_tuning(path or default_tuning_path(), base_key)
            if isinstance(entry, dict):
                entry = {**entry, "fallback_from": base_key}
        entry = entry or {}
    except (OSError, ValueError, AttributeError, TypeError):
        return {}
    if not isinstance(entry, dict):
        return {}
    recorded = entry.get("device")
    if recorded is not None and recorded != str(jax.devices()[0]):
        return {}
    return entry


def _parse_prior_table(entry: Dict, key: str) -> Optional[Dict]:
    """JSON-persisted sweep table ({str(candidate): ms}) → {candidate: ms}
    with the original candidate types (int / bool / tuple) restored, for
    resumed sweeps. None if absent or unparseable."""
    import ast

    tbl = entry.get(key)
    if not isinstance(tbl, dict):
        return None
    out: Dict = {}
    for k, v in tbl.items():
        try:
            out[ast.literal_eval(k)] = v
        except (ValueError, SyntaxError):
            return None
    return out


def tune_and_save(
    config: ViTConfig,
    batch: int,
    *,
    dtype=jnp.bfloat16,
    path: str | os.PathLike | None = None,
    iters: int = 20,
    timer: Optional[Callable] = None,
    quant: Optional[str] = None,
    knobs: Optional[Sequence[str]] = None,
    points: Optional[int] = None,
) -> Dict:
    """Sweep every production knob for this (config, batch, dtype[, quant])
    on the current device and persist the winners.

    ``knobs`` restricts the sweep (subset of {"attention", "ragged",
    "blockwise", "ipc"}) — big configs' attention sweeps can take many
    minutes per compile on the tunneled relay, and a partial sweep merges
    into the existing cache entry rather than replacing it.

    ``points`` caps the NEW measurements this invocation takes (a W8A8
    kernel compile at ViT-L/H/G width is minutes on the relay, so a full
    sweep exceeds any safe window). Candidates already present in the
    persisted table are skipped; each run measures up to ``points`` more and
    merges the table back, so repeated short invocations accumulate into a
    complete sweep. A knob's winner key is written only once its table
    covers every candidate — until then engines fall back to the shipped
    heuristics, never to a half-swept winner.
    """
    from ..ops import fused_block

    path = path or default_tuning_path()
    all_knobs = ("attention", "attention_bwd", "ragged", "blockwise", "ipc")
    if knobs is None:
        # attention_bwd is a TRAINING kernel — swept by default only for
        # the training entry (quant="train"); inference sweeps skip it.
        knobs = all_knobs if quant == "train" else (
            "attention", "ragged", "blockwise", "ipc")
    else:
        knobs = tuple(knobs)
    unknown = set(knobs) - set(all_knobs)
    if unknown:
        raise ValueError(f"unknown knobs {sorted(unknown)}; pick from "
                         f"{all_knobs}")
    if points is not None and points < 1:
        raise ValueError(f"points must be >= 1, got {points}")
    budget = [points] if points is not None else None
    dtype_bytes = (1 if quant and quant.startswith("int8")
                   else jnp.dtype(dtype).itemsize)
    # W8A8 never routes through the stack kernel (models/vit.encoder: its
    # unrolled-stack + quantize body compiles for >10 min), and TRAINING
    # never does either (the stack kernel has no VJP) — sweep what
    # production will actually run.
    stack_ok = (quant not in ("int8-w8a8", "train")
                and fused_block.supports_stack(config, dtype_bytes=dtype_bytes))
    result: Dict = {
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    if set(knobs) != set(all_knobs) or points is not None:
        # A PARTIAL sweep (restricted knobs or a points budget) merges into
        # the prior same-device entry; a full sweep replaces it outright
        # (merging there would let knobs whose sweep condition now skips
        # them persist stale forever).
        prior = load_tuning(path, tuning_key(config, batch, dtype, quant))
        if isinstance(prior, dict) and prior.get("device") == result["device"]:
            result = {**prior, **result}

    def left() -> bool:
        return budget is None or budget[0] > 0

    def writer(table_key):
        """Write-through persistence: flush the partial table to the cache
        after EVERY measured point, so a killed run (big-config compiles
        can exceed any safe timeout on the relay) loses nothing."""
        def on_point(table):
            result[table_key] = {str(k): v for k, v in table.items()}
            os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
            save_tuning(path, tuning_key(config, batch, dtype, quant),
                        result)
        return on_point

    # Stack-class configs never execute packed attention in production (the
    # whole encoder is one launch), so BOTH packed-attention sweeps would be
    # wasted relay compiles there; per-layer-class configs keep them for the
    # engines' flash route (fused-unsupported widths/dtypes) and for direct
    # kernel users.
    if "attention" in knobs and not stack_ok and left():
        attn_ipc, attn_table = tune_attention_ipc(
            config, batch, dtype=dtype, iters=iters, timer=timer,
            prior=_parse_prior_table(result, "attention_table_ms"),
            budget=budget, on_point=writer("attention_table_ms"),
        )
        if attn_ipc is not None:
            result["attention_ipc"] = int(attn_ipc)
        result["attention_table_ms"] = {str(k): v
                                        for k, v in attn_table.items()}
    if "attention_bwd" in knobs and not stack_ok and left():
        bwd_ipc, bwd_table = tune_attention_bwd_ipc(
            config, batch, dtype=dtype, iters=iters, timer=timer,
            prior=_parse_prior_table(result, "attention_bwd_table_ms"),
            budget=budget, on_point=writer("attention_bwd_table_ms"),
        )
        if bwd_ipc is not None:
            result["attention_bwd_ipc"] = int(bwd_ipc)
        result["attention_bwd_table_ms"] = {
            str(k): v for k, v in bwd_table.items()}
    if "ragged" in knobs and not stack_ok and left():
        ragged, ragged_table = tune_ragged_route(
            config, batch, dtype=dtype, iters=iters, timer=timer,
            prior=_parse_prior_table(result, "attention_ragged_table_ms"),
            budget=budget, on_point=writer("attention_ragged_table_ms"),
        )
        if ragged is not None:
            result["attention_ragged"] = bool(ragged)
        result["attention_ragged_table_ms"] = {
            str(k): v for k, v in ragged_table.items()}
    if "blockwise" in knobs and config.num_tokens > 1024 and left():
        # Long-sequence configs route through the blockwise flash kernel:
        # sweep its block shapes too.
        bqk, bw_table = tune_blockwise_blocks(
            config.num_tokens, config.head_dim,
            batch_heads=min(batch * config.num_heads, 16), dtype=dtype,
            iters=iters, timer=timer,
            prior=_parse_prior_table(result, "blockwise_table_ms"),
            budget=budget, on_point=writer("blockwise_table_ms"),
        )
        if bqk is not None:
            result["blockwise_block_q"] = int(bqk[0])
            result["blockwise_block_k"] = int(bqk[1])
        result["blockwise_table_ms"] = {str(k): v
                                        for k, v in bw_table.items()}
    if "ipc" in knobs and left():
        if stack_ok:
            # Production path for this config is the whole-encoder stack
            # kernel — sweep THAT (the per-layer winner would regress it).
            st_ipc, st_table = tune_fused_stack_ipc(
                config, batch, dtype=dtype, iters=iters, timer=timer,
                quant=quant,
                prior=_parse_prior_table(result, "fused_stack_table_ms"),
                budget=budget, on_point=writer("fused_stack_table_ms"),
            )
            if st_ipc is not None:
                result["fused_stack_ipc"] = int(st_ipc)
            result["fused_stack_table_ms"] = {str(k): v
                                              for k, v in st_table.items()}
        elif fused_block.supports(config, dtype_bytes=dtype_bytes):
            fb_ipc, fb_table = tune_fused_block_ipc(
                config, batch, dtype=dtype, iters=iters, timer=timer,
                quant=quant,
                prior=_parse_prior_table(result, "fused_block_table_ms"),
                budget=budget, on_point=writer("fused_block_table_ms"),
            )
            if fb_ipc is not None:
                result["fused_block_ipc"] = int(fb_ipc)
            result["fused_block_table_ms"] = {str(k): v
                                              for k, v in fb_table.items()}
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    save_tuning(path, tuning_key(config, batch, dtype, quant), result)
    return result


def main(argv=None) -> int:
    """CLI: sweep launch configs on this device and save the tuning cache
    that InferenceEngine / the serving daemon consult at startup."""
    import argparse

    from ..config import PRESETS, get_config

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("--config", default="vit_b_16_224",
                        choices=sorted(PRESETS))
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--out", default=None,
                        help=f"tuning file (default {default_tuning_path()})")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--quant", default=None,
                        choices=["int8", "int8-w8a8", "train"],
                        help="sweep the quantized kernel variants, or"
                             " 'train' for the training-step entry (adds"
                             " the backward-attention knob; Trainer"
                             " consults this key)")
    parser.add_argument("--knobs", default=None,
                        help="comma list of {attention,attention_bwd,"
                             "ragged,blockwise,ipc}"
                             " — restrict the sweep (big-config attention"
                             " sweeps can take minutes per compile on the"
                             " relay); partial results merge into the cache")
    parser.add_argument("--points", type=int, default=None,
                        help="measure at most N NEW candidates this run and"
                             " merge into the cache — repeated short"
                             " invocations accumulate a complete big-config"
                             " sweep (winners are written only once a knob's"
                             " table is complete)")
    args = parser.parse_args(argv)
    cfg = get_config(args.config)
    knobs = ([k.strip() for k in args.knobs.split(",") if k.strip()]
             if args.knobs else None)
    result = tune_and_save(cfg, args.batch, dtype=jnp.dtype(args.dtype),
                           path=args.out, iters=args.iters, quant=args.quant,
                           knobs=knobs, points=args.points)
    print(json.dumps({tuning_key(cfg, args.batch, jnp.dtype(args.dtype),
                                 args.quant):
                      result}, indent=2))
    return 0


def save_tuning(path: str | os.PathLike, key: str, result: Dict) -> None:
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[key] = result
    with open(path, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)


def load_tuning(path: str | os.PathLike, key: str) -> Optional[Dict]:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):  # truncated/foreign file: treat as empty
        return None
    return data.get(key)


if __name__ == "__main__":  # pragma: no cover — `python -m ...` convenience
    import sys

    sys.exit(main())
