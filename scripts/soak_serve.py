"""Sustained serving soak THROUGH THE SOCKET: concurrent clients pumping
uint8 payloads at the dynamic-batching daemon for a fixed duration.

Unlike scripts/soak.py (which loops the jitted forward directly), this
exercises the full production path — wire protocol, batcher coalescing,
device-side uint8 normalization, result formatting — under sustained
concurrent load, and reports aggregate img/s, per-request latency
percentiles, and the daemon's own STATS counters. Mirrors the reference's
long-run usage (per-picture clock() loop, ViT_opencl.c:964) one level up,
at the serving layer the reference never had.

Usage: python scripts/soak_serve.py [config] [batch] [seconds] [clients] [quant]
"""
from __future__ import annotations

import sys
import threading
import time

import jax.numpy as jnp
import numpy as np

from vit_with_opencl_tpu import get_config, serve
from vit_with_opencl_tpu.engine import InferenceEngine, enable_compilation_cache
from vit_with_opencl_tpu.harness import fixtures


def main():
    enable_compilation_cache()
    name = sys.argv[1] if len(sys.argv) > 1 else "vit_b_16_224"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
    clients = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    quant = sys.argv[5] if len(sys.argv) > 5 else "int8-w8a8"
    if quant in ("none", "bf16"):
        quant = None
    cfg = get_config(name)
    params = fixtures.random_params(cfg, seed=0, scale=0.05)
    engine = InferenceEngine(
        cfg, params, batch_size=batch, compute_dtype=jnp.bfloat16,
        quantize=quant, normalize_uint8=True,
    )
    compile_s = engine.warmup()
    srv = serve.InferenceServer(engine, port=0, max_wait_ms=20.0)
    srv.start_background()
    port = srv.address[1]
    print(f"serving {cfg.name} bs={batch} quant={quant} on :{port} "
          f"(compile {compile_s:.1f}s); soaking {seconds:.0f}s x "
          f"{clients} clients")

    # Each client sends batch/clients images per request so the batcher can
    # coalesce the concurrent payloads into full engine batches.
    per_req = max(1, batch // clients)
    rng = np.random.default_rng(0)
    payload_imgs = rng.integers(
        0, 256, (per_req, 3, cfg.img_size, cfg.img_size), np.uint8)

    latencies: list = []
    counts = [0] * clients
    stop = threading.Event()
    lock = threading.Lock()
    errs: list = []

    def client(i):
        try:
            while not stop.is_set():
                t0 = time.perf_counter()
                out = serve.classify(payload_imgs, port=port)
                dt = time.perf_counter() - t0
                assert len(out) == per_req
                with lock:
                    latencies.append(dt)
                    counts[i] += per_req
        except Exception as e:
            with lock:
                errs.append(e)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wall = time.perf_counter() - t_start

    total = sum(counts)
    lat = np.sort(np.asarray(latencies))
    s = serve.stats(port=port)
    srv.shutdown()
    if errs:
        print(f"ERRORS: {errs[:3]}")
    print(f"soak_serve: {total} images in {wall:.1f}s = "
          f"{total / wall:.0f} img/s through the socket; "
          f"{len(lat)} requests, latency p50 {lat[len(lat) // 2] * 1e3:.0f}ms "
          f"p95 {lat[int(len(lat) * 0.95)] * 1e3:.0f}ms "
          f"max {lat[-1] * 1e3:.0f}ms")
    print(f"daemon stats: {s}")
    assert s["batch_errors"] == 0, "batches failed during soak"
    assert s["images_served"] >= total


if __name__ == "__main__":
    main()
