#!/usr/bin/env python
"""Run bench.py for the whole BASELINE config matrix; print a summary table.

Each config runs in a fresh subprocess (clean PJRT client, isolates relay
hiccups). Use after kernel changes to refresh BENCH.md.
"""

import json
import os
import subprocess
import sys

CONFIGS = [
    # (config, batch, iters, quant) — quant None inherits BENCH_QUANT's
    # default (int8-w8a8); the VPU-bound small models pin bf16, their
    # measured production mode (BENCH.md: Tiny regresses under W8A8).
    ("vit_b_16_224", 256, 50, None),
    ("vit_s_16_224", 512, 30, None),
    ("vit_l_16_384", 64, 20, None),
    ("vit_tiny_16_224", 1024, 30, "bf16"),
    ("vit_h_14_224", 32, 30, None),
    ("vit_g_14_224", 32, 15, None),
    ("deit_b_16_224", 256, 30, None),
    ("clip_vit_b_16", 256, 30, None),
]


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    bench = os.path.join(here, "..", "bench.py")
    rows = []
    for config, batch, iters, quant in CONFIGS:
        env = dict(os.environ, BENCH_CONFIG=config, BENCH_BATCH=str(batch),
                   BENCH_ITERS=str(iters))
        if quant is not None:
            env["BENCH_QUANT"] = quant
        proc = subprocess.run(
            [sys.executable, bench], env=env, capture_output=True, text=True,
            timeout=900,
        )
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("{")), None)
        if line is None:
            print(f"{config}: FAILED\n{proc.stderr[-500:]}", file=sys.stderr)
            rows.append((config, batch, None))
            continue
        rows.append((config, batch, json.loads(line)))
        print(line, flush=True)

    print(f"\n{'config':<20}{'batch':>7}{'img/s':>10}{'vs target':>11}")
    print("-" * 48)
    for config, batch, r in rows:
        if r is None:
            print(f"{config:<20}{batch:>7}{'FAILED':>10}")
        else:
            print(f"{config:<20}{batch:>7}{r['value']:>10.1f}"
                  f"{r['vs_baseline']:>11.3f}")
    return 0 if all(r is not None for _, _, r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
