"""Trace-derived per-kernel DEVICE timing table.

The reference's (disabled) profiling scaffold read true device event spans —
``CL_PROFILING_COMMAND_START/END`` accumulated into per-kernel totals and a
totals/averages report (reference: ViT_opencl.c:988-1048). The host-side
tools in perf/profiler.py approximate that with wall-clock of isolated
stages or substitution deltas; this module restores the real thing: run the
jitted program under ``jax.profiler``, parse the emitted trace-viewer JSON,
and aggregate the DEVICE-side op events into per-kernel totals/averages —
device time inside the actual fused program, not host wall-clock of
look-alike stages.

The trace files are the Chrome-trace JSON the XLA profiler writes under
``plugins/profile/<run>/<host>.trace.json.gz`` — a stable, documented
format: ``ph == "M"`` metadata events name processes/threads, ``ph == "X"``
complete events carry ``dur`` microseconds. Device lanes are the processes
whose name carries a device ordinal ("/device:TPU:0" etc.); within them the
per-op lane is the thread named "XLA Ops" (falling back to every complete
event in device lanes, then to all complete events, so the table degrades
gracefully on backends with sparser traces, e.g. CPU).
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import tempfile
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


@dataclasses.dataclass
class KernelSpan:
    """One kernel's aggregated device time across the traced window."""

    name: str
    calls: int
    total_ms: float

    @property
    def avg_ms(self) -> float:
        return self.total_ms / max(self.calls, 1)


def _fence(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def _load_trace_events(trace_dir: str) -> List[dict]:
    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ))
    events: List[dict] = []
    for path in files:
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def _select_device_events(events: List[dict]) -> List[dict]:
    """Complete (ph=X) events from device lanes, preferring the per-op
    thread; degrade to all device events, then all complete events."""
    proc_names: Dict[Any, str] = {}
    thread_names: Dict[Tuple[Any, Any], str] = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            thread_names[(e.get("pid"), e.get("tid"))] = e.get(
                "args", {}).get("name", "")

    device_pids = {
        pid for pid, name in proc_names.items()
        if "/device:" in name.lower() or "tpu" in name.lower()
    }
    complete = [e for e in events if e.get("ph") == "X" and e.get("dur")]
    dev = [e for e in complete if e.get("pid") in device_pids]
    ops = [
        e for e in dev
        if "xla op" in thread_names.get((e.get("pid"), e.get("tid")),
                                        "").lower()
    ]
    return ops or dev or complete


def device_kernel_table(
    fn: Callable,
    args: tuple,
    *,
    iters: int = 3,
    trace_dir: Optional[str] = None,
    top: Optional[int] = None,
) -> List[KernelSpan]:
    """Run ``fn(*args)`` ``iters`` times under the XLA profiler and return
    per-kernel device-time totals/averages, largest first.

    Compiles/warms OUTSIDE the traced window so the table reflects steady
    state. Totals cover all ``iters`` runs; divide by ``iters`` for
    per-invocation numbers (the call count is reported as traced).
    """
    out = fn(*args)
    _fence(out)  # compile + warm outside the trace
    d = trace_dir or tempfile.mkdtemp(prefix="vit-tpu-trace-")
    jax.profiler.start_trace(d)
    try:
        for _ in range(iters):
            out = fn(*args)
        _fence(out)
    finally:
        jax.profiler.stop_trace()

    agg: Dict[str, KernelSpan] = {}
    for e in _select_device_events(_load_trace_events(d)):
        name = e.get("name", "?")
        span = agg.get(name)
        dur_ms = float(e["dur"]) / 1e3  # trace durations are microseconds
        if span is None:
            agg[name] = KernelSpan(name, 1, dur_ms)
        else:
            span.calls += 1
            span.total_ms += dur_ms
    table = sorted(agg.values(), key=lambda s: -s.total_ms)
    return table[:top] if top else table


def format_kernel_table(table: List[KernelSpan], *,
                        iters: int = 1) -> str:
    """The reference reporter's totals/averages shape
    (ViT_opencl.c:1003-1048), fed by device event spans."""
    lines = [
        f"{'kernel':<48}{'calls':>8}{'total ms':>12}{'avg ms':>10}",
        "-" * 78,
    ]
    total = 0.0
    for s in table:
        total += s.total_ms
        name = s.name if len(s.name) <= 47 else s.name[:44] + "..."
        lines.append(
            f"{name:<48}{s.calls:>8}{s.total_ms:>12.3f}{s.avg_ms:>10.4f}"
        )
    lines.append("-" * 78)
    per_run = f" ({total / iters:.3f} ms/run over {iters} runs)" \
        if iters > 1 else ""
    lines.append(f"{'device total':<48}{'':>8}{total:>12.3f}{per_run}")
    return "\n".join(lines)
