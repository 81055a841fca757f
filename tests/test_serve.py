"""Serving daemon: wire protocol, dynamic batching, error paths."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.engine import InferenceEngine
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import golden
from vit_with_opencl_tpu import serve

CFG = ViTConfig(name="srv", img_size=32, patch_size=8, embed_dim=48, depth=1,
                num_heads=4, num_classes=7)


@pytest.fixture(scope="module")
def server():
    params = fixtures.random_params(CFG, seed=0, scale=0.05)
    engine = InferenceEngine(
        CFG, params, batch_size=4, param_dtype=jnp.float32,
        compute_dtype=jnp.float32,
    )
    engine.warmup()
    srv = serve.InferenceServer(engine, port=0, max_wait_ms=20.0)
    srv.start_background()
    yield srv, params
    srv.shutdown()


def _expected(params, images):
    probs = golden.golden_forward(images, params, CFG)
    return [(int(p.argmax()), float(p.max())) for p in probs]


def test_single_request(server):
    srv, params = server
    images = fixtures.random_images(CFG, n=2, seed=1)
    got = serve.classify(images, port=srv.address[1])
    want = _expected(params, images)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-4


def test_concurrent_requests_are_batched(server):
    srv, params = server
    before = srv.batcher.batches_run
    images = fixtures.random_images(CFG, n=8, seed=2)
    results_out = [None] * 8
    threads = []

    def worker(i):
        results_out[i] = serve.classify(images[i : i + 1], port=srv.address[1])[0]

    for i in range(8):
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    want = _expected(params, images)
    assert [r[0] for r in results_out] == [w[0] for w in want]
    batches = srv.batcher.batches_run - before
    # 8 images through a batch-4 engine: must have coalesced (< 8 batches).
    assert batches < 8


def test_bad_shape_reports_error(server):
    srv, _ = server
    wrong = np.zeros((1, 3, 16, 16), np.float32)
    with pytest.raises(RuntimeError, match="ERROR: expected images"):
        serve.classify(wrong, port=srv.address[1])


def test_garbage_payload_keeps_server_alive(server):
    import socket
    import struct

    srv, params = server
    with socket.create_connection(("127.0.0.1", srv.address[1])) as sock:
        payload = b"not an image binary at all"
        sock.sendall(struct.pack("<I", len(payload)) + payload)
        n = struct.unpack("<I", sock.recv(4))[0]
        msg = sock.recv(n).decode()
        assert msg.startswith("ERROR:")
    # server still serves
    images = fixtures.random_images(CFG, n=1, seed=3)
    got = serve.classify(images, port=srv.address[1])
    assert got[0][0] == _expected(params, images)[0][0]


def test_engine_failure_fails_request_but_daemon_survives(server, monkeypatch):
    """One bad batch must not brick the batcher or hang clients (review
    finding: an unguarded engine.run killed the loop permanently)."""
    srv, params = server
    original = srv.batcher.engine.run
    calls = {"n": 0}

    def flaky(images):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FloatingPointError("injected failure")
        return original(images)

    monkeypatch.setattr(srv.batcher.engine, "run", flaky)
    images = fixtures.random_images(CFG, n=1, seed=9)
    with pytest.raises(RuntimeError, match="inference failed"):
        serve.classify(images, port=srv.address[1])
    # Daemon still alive and correct afterwards.
    got = serve.classify(images, port=srv.address[1])
    assert got[0][0] == _expected(params, images)[0][0]


def test_multi_image_payload_single_batch(server):
    """An n-image payload must coalesce into ceil(n/bs) batches, not n
    (review finding: per-image blocking submits defeated the batcher)."""
    srv, params = server
    before = srv.batcher.batches_run
    images = fixtures.random_images(CFG, n=4, seed=10)  # == engine batch size
    got = serve.classify(images, port=srv.address[1])
    assert [g[0] for g in got] == [w[0] for w in _expected(params, images)]
    assert srv.batcher.batches_run - before == 1


def test_uint8_serving_end_to_end():
    """uint8 wire mode: raw pixels in, device-side normalization — results
    match host-side preprocessing + float serving."""
    from vit_with_opencl_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD

    params = fixtures.random_params(CFG, seed=2, scale=0.05)
    engine_u8 = InferenceEngine(
        CFG, params, batch_size=2, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, normalize_uint8=True,
    )
    srv = serve.InferenceServer(engine_u8, port=0, max_wait_ms=10.0)
    srv.start_background()
    try:
        raw = np.random.default_rng(0).integers(
            0, 256, (2, 3, CFG.img_size, CFG.img_size), np.uint8
        )
        got = serve.classify(raw, port=srv.address[1])
        # reference: normalize on host, run golden
        norm = (raw.astype(np.float32) / 255.0
                - IMAGENET_MEAN.reshape(1, 3, 1, 1)) / IMAGENET_STD.reshape(1, 3, 1, 1)
        want = _expected(params, norm.astype(np.float32))
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-4
        # float payload to a uint8 server → clean error
        with pytest.raises(RuntimeError, match="does not match"):
            serve.classify(norm.astype(np.float32), port=srv.address[1])
    finally:
        srv.shutdown()


def test_w8a8_serving_end_to_end():
    """`--quantize int8-w8a8` behind the daemon: int8 weights + per-token
    int8 activations; results stay within the reference comparator gate
    (0.01 on probabilities) and top-1 matches the fp32 golden."""
    params = fixtures.random_params(CFG, seed=3, scale=0.05)
    engine_q = InferenceEngine(
        CFG, params, batch_size=4, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, quantize="int8-w8a8",
    )
    srv = serve.InferenceServer(engine_q, port=0, max_wait_ms=10.0)
    srv.start_background()
    try:
        images = fixtures.random_images(CFG, n=4, seed=4)
        got = serve.classify(images, port=srv.address[1])
        want = _expected(params, images)
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-2
    finally:
        srv.shutdown()


def test_stats_request(server):
    """STATS wire request returns the daemon's observability counters."""
    srv, params = server
    images = fixtures.random_images(CFG, n=2, seed=5)
    serve.classify(images, port=srv.address[1])
    s = serve.stats(port=srv.address[1])
    assert s["images_served"] >= 2
    assert s["batches_run"] >= 1
    assert s["config"] == CFG.name
    assert s["batch_size"] == 4
    assert s["queue_depth"] == 0
    assert s["uptime_s"] >= 0


def test_dp_fanout_serving_end_to_end():
    """DataParallelEngine behind the daemon: a coalesced batch shards over
    the 8-device virtual mesh (VERDICT r1 item 9: serving was single-engine,
    single-device)."""
    import jax

    from vit_with_opencl_tpu.engine import DataParallelEngine

    assert len(jax.devices()) >= 8
    params = fixtures.random_params(CFG, seed=3, scale=0.05)
    engine = DataParallelEngine(
        CFG, params, batch_size=8, param_dtype=jnp.float32,
        compute_dtype=jnp.float32,
    )
    assert engine.n_devices == 8
    engine.warmup()
    srv = serve.InferenceServer(engine, port=0, max_wait_ms=50.0)
    srv.start_background()
    try:
        images = fixtures.random_images(CFG, n=8, seed=4)
        got = serve.classify(images, port=srv.address[1])
        want = _expected(params, images)
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-4
        s = serve.stats(port=srv.address[1])
        assert s["n_devices"] == 8
        assert s["images_served"] >= 8
    finally:
        srv.shutdown()


def test_dp_engine_batch_divisibility():
    from vit_with_opencl_tpu.engine import DataParallelEngine

    params = fixtures.random_params(CFG, seed=3, scale=0.05)
    with pytest.raises(ValueError, match="not divisible"):
        DataParallelEngine(CFG, params, batch_size=3)


def test_uint8_dp_serving_end_to_end():
    """uint8 wire mode COMPOSED with data-parallel fan-out (round-2 verdict
    item 7): raw pixels shard over the mesh and normalize on device."""
    import jax

    from vit_with_opencl_tpu.engine import DataParallelEngine
    from vit_with_opencl_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD

    assert len(jax.devices()) >= 8
    params = fixtures.random_params(CFG, seed=2, scale=0.05)
    engine = DataParallelEngine(
        CFG, params, batch_size=8, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, normalize_uint8=True,
    )
    engine.warmup()
    srv = serve.InferenceServer(engine, port=0, max_wait_ms=50.0)
    srv.start_background()
    try:
        raw = np.random.default_rng(1).integers(
            0, 256, (8, 3, CFG.img_size, CFG.img_size), np.uint8
        )
        got = serve.classify(raw, port=srv.address[1])
        norm = (raw.astype(np.float32) / 255.0
                - IMAGENET_MEAN.reshape(1, 3, 1, 1)
                ) / IMAGENET_STD.reshape(1, 3, 1, 1)
        want = _expected(params, norm.astype(np.float32))
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) < 1e-4
        # float payload to a uint8 DP server → clean error, daemon survives
        with pytest.raises(RuntimeError, match="does not match"):
            serve.classify(norm.astype(np.float32), port=srv.address[1])
        assert serve.stats(port=srv.address[1])["n_devices"] == 8
    finally:
        srv.shutdown()


def test_dp_engine_uint8_dtype_guards():
    from vit_with_opencl_tpu.engine import DataParallelEngine

    params = fixtures.random_params(CFG, seed=3, scale=0.05)
    eng = DataParallelEngine(CFG, params, batch_size=8,
                             param_dtype=jnp.float32,
                             compute_dtype=jnp.float32, normalize_uint8=True)
    floats = np.zeros((8, 3, CFG.img_size, CFG.img_size), np.float32)
    with pytest.raises(ValueError, match="expects raw"):
        eng.run(floats)
    eng_f = DataParallelEngine(CFG, params, batch_size=8,
                               param_dtype=jnp.float32,
                               compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="preprocess first"):
        eng_f.run(floats.astype(np.uint8))


def test_concurrent_stress_mixed_sizes_uint8_dp():
    """Serve-under-concurrency stress (round-3 verdict item 8): many client
    threads firing mixed-size uint8 payloads at a DP daemon on the 8-device
    virtual mesh. Asserts no cross-request interleaving corruption (every
    response matches the golden for exactly the images that request sent, in
    order), bounded per-request latency, and STATS consistency afterwards."""
    import time as _time

    import jax

    from vit_with_opencl_tpu.engine import DataParallelEngine
    from vit_with_opencl_tpu.io.preprocess import IMAGENET_MEAN, IMAGENET_STD

    assert len(jax.devices()) >= 8
    params = fixtures.random_params(CFG, seed=7, scale=0.05)
    engine = DataParallelEngine(
        CFG, params, batch_size=8, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, normalize_uint8=True,
    )
    engine.warmup()
    srv = serve.InferenceServer(engine, port=0, max_wait_ms=5.0)
    srv.start_background()
    try:
        # Pool of distinct images with precomputed golden answers, so any
        # cross-request image/result swap flips top-1 and is caught.
        pool = np.random.default_rng(2).integers(
            0, 256, (16, 3, CFG.img_size, CFG.img_size), np.uint8
        )
        norm = (pool.astype(np.float32) / 255.0
                - IMAGENET_MEAN.reshape(1, 3, 1, 1)
                ) / IMAGENET_STD.reshape(1, 3, 1, 1)
        want = _expected(params, norm.astype(np.float32))

        n_threads, reqs_per_thread = 6, 5
        sizes = [1, 2, 3, 5, 8]
        errors: list = []
        latencies: list = []
        lock = threading.Lock()

        def client(tid):
            rng = np.random.default_rng(100 + tid)
            try:
                for r in range(reqs_per_thread):
                    n = sizes[(tid + r) % len(sizes)]
                    idx = rng.choice(len(pool), size=n, replace=False)
                    t0 = _time.perf_counter()
                    got = serve.classify(pool[idx], port=srv.address[1])
                    dt = _time.perf_counter() - t0
                    assert len(got) == n, f"got {len(got)} results for {n}"
                    for j, k in enumerate(idx):
                        assert got[j][0] == want[k][0], (
                            f"thread {tid} req {r} img {j}: label "
                            f"{got[j][0]} != golden {want[k][0]} — "
                            "cross-request corruption")
                        assert abs(got[j][1] - want[k][1]) < 1e-4
                    with lock:
                        latencies.append(dt)
            except Exception as e:  # propagate to the main thread
                with lock:
                    errors.append((tid, e))

        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors[:3]
        total = n_threads * reqs_per_thread
        assert len(latencies) == total
        # Bounded queue latency: generous CPU bound; a stuck batcher or a
        # deadlocked waiter would blow way past this.
        assert max(latencies) < 30.0, f"max latency {max(latencies):.1f}s"
        s = serve.stats(port=srv.address[1])
        sent = sum(sizes[(tid + r) % len(sizes)]
                   for tid in range(n_threads)
                   for r in range(reqs_per_thread))
        assert s["images_served"] == sent
        assert s["batch_errors"] == 0
        assert s["queue_depth"] == 0
        # Coalescing actually happened: strictly fewer batches than requests
        # would be needed un-coalesced at these sizes.
        assert s["batches_run"] < sent
    finally:
        srv.shutdown()
