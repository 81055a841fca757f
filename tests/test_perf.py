"""Profiler smoke tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.perf import format_profile, profile_ops, throughput_report

CFG = ViTConfig(name="perf_small", img_size=32, patch_size=8, embed_dim=64,
                depth=2, num_heads=4, num_classes=11)


def test_profile_ops_and_format():
    params = vit.stack_params(fixtures.random_params(CFG, seed=0), CFG,
                              param_dtype=jnp.float32)
    images = jnp.asarray(fixtures.random_images(CFG, n=4, seed=0))
    stages = profile_ops(CFG, params, images, compute_dtype=jnp.float32, iters=2)
    names = [s.name for s in stages]
    assert "attention_core" in names and "mlp_fc1_gelu" in names
    assert all(s.per_call_ms >= 0 for s in stages)
    table = format_profile(stages, batch=4)
    assert "attention_core" in table and "ms/batch total" in table


def test_throughput_report_math():
    r = throughput_report(CFG, batch=8, elapsed_s=2.0, iters=10, tpu_gen="v5e")
    assert np.isclose(r["images_per_sec"], 40.0)
    assert r["mfu"] > 0
    assert np.isclose(
        r["achieved_tflops"],
        r["images_per_sec"] * r["gflop_per_image"] / 1e3,
    )


def test_autotune_sweep_mechanics():
    from vit_with_opencl_tpu.perf import autotune

    # fake timer: candidate 4 is "fastest"; candidate 8 "OOMs" at build time
    def build(c):
        if c == 8:
            raise RuntimeError("RESOURCE_EXHAUSTED: vmem")
        return lambda x: x * c

    def timer(fn, args, iters):
        return abs(fn(1.0) - 4.0) + 0.1

    best, table = autotune.sweep((1, 2, 4, 8), build, (), timer=timer)
    assert best == 4
    assert table[8] == float("inf")


def test_autotune_attention_ipc_interpret(monkeypatch):
    """End-to-end sweep mechanics with a stub timer (compiled kernels need
    TPU; the selection path is what's under test here)."""
    from vit_with_opencl_tpu.perf import autotune
    from vit_with_opencl_tpu import ViTConfig

    cfg = ViTConfig(name="a", img_size=32, patch_size=8, embed_dim=64,
                    depth=1, num_heads=4)

    def timer(fn, args, iters):
        return 1.0

    best, table = autotune.tune_attention_ipc(
        cfg, batch=4, candidates=(1, 2, 3, 4), timer=timer
    )
    assert set(table) == {1, 2, 4}  # 3 doesn't divide the batch
    assert best in table


def test_autotune_cache_roundtrip(tmp_path):
    from vit_with_opencl_tpu.perf import autotune

    p = tmp_path / "tune.json"
    autotune.save_tuning(p, "vit_b/256/bf16", {"ipc": 4, "ms": 1.9})
    autotune.save_tuning(p, "vit_l/64/bf16", {"ipc": 1, "ms": 4.4})
    assert autotune.load_tuning(p, "vit_b/256/bf16") == {"ipc": 4, "ms": 1.9}
    assert autotune.load_tuning(p, "missing") is None


def test_tune_and_save_then_engine_consumes(tmp_path):
    """The production loop: vit-tpu-tune sweeps + saves; InferenceEngine
    looks the winners up at startup and threads them into the kernel table
    (VERDICT r1 item 7: the cache was previously never consumed)."""
    from vit_with_opencl_tpu.engine import InferenceEngine
    from vit_with_opencl_tpu.models import golden
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    calls = []

    def fake_timer(fn, args, iters):
        calls.append(fn)
        return float(len(calls))  # first candidate "wins"

    result = autotune.tune_and_save(
        CFG, 4, dtype=jnp.float32, path=path, timer=fake_timer
    )
    # CFG's whole stack fits VMEM, so the sweep targets the production
    # path for it — the whole-encoder STACK kernel, not the per-layer one,
    # and the packed-attention sweeps are skipped (dead code for it).
    assert "fused_stack_ipc" in result
    assert "fused_block_ipc" not in result
    assert "attention_ipc" not in result
    saved = autotune.lookup(CFG, 4, jnp.float32, path=path)
    assert saved["fused_stack_ipc"] == result["fused_stack_ipc"]
    assert autotune.lookup(CFG, 999, jnp.float32, path=path) == {}

    named = fixtures.random_params(CFG, seed=1, scale=0.05)
    images = fixtures.random_images(CFG, n=4, seed=2)
    eng = InferenceEngine(
        CFG, named, batch_size=4, param_dtype=jnp.float32,
        compute_dtype=jnp.float32, attention_impl="flash",
        tuning_path=str(path),
    )
    assert eng.tuning["fused_stack_ipc"] == result["fused_stack_ipc"]
    ref = golden.golden_forward(images, named, CFG)
    got = eng.run(images)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resolve_kernels_tuning_override():
    kern = vit.resolve_kernels("flash", tuning={"attention_ipc": 2,
                                                "fused_block_ipc": 4,
                                                "fused_stack_ipc": 2})
    assert kern["attention_packed"].keywords["images_per_cell"] == 2
    assert kern["fused_block_ipc"] == 4
    assert kern["fused_stack_ipc"] == 2
    # No tuning → the raw function with its internal heuristic.
    kern_default = vit.resolve_kernels("flash")
    assert not hasattr(kern_default["attention_packed"], "keywords")


def test_attribute_forward_substitution():
    """Substitution attribution runs the real fused forward plus three
    substituted variants and returns consistent shares."""
    from vit_with_opencl_tpu import ViTConfig
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import vit
    from vit_with_opencl_tpu.perf import profiler

    cfg = ViTConfig(name="attr", img_size=32, patch_size=8, embed_dim=64,
                    depth=2, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=7, scale=0.05)
    stacked = vit.stack_params(params, cfg, param_dtype=jnp.float32)
    images = jnp.asarray(fixtures.random_images(cfg, n=4, seed=7))
    a = profiler.attribute_forward(cfg, stacked, images,
                                   compute_dtype=jnp.float32, iters=1)
    assert a["total_ms"] > 0 and a["gemm_skeleton_ms"] > 0
    for k in ("gelu_share", "softmax_share", "vpu_share"):
        assert 0.0 <= a[k] <= 1.0
    # the patched functions must be restored afterwards
    from vit_with_opencl_tpu.ops import attention, fused_block
    assert fused_block._gelu_fast.__name__ == "_gelu_fast"
    assert attention._head_attention.__name__ == "_head_attention"


def test_attribute_forward_w8a8_quantize_share():
    """W8A8 attribution isolates the dynamic-quantization VPU cost with a
    constant-scale convert substitution and restores the hook."""
    from vit_with_opencl_tpu import ViTConfig
    from vit_with_opencl_tpu.harness import fixtures
    from vit_with_opencl_tpu.models import quant, vit
    from vit_with_opencl_tpu.perf import profiler

    cfg = ViTConfig(name="attr8", img_size=32, patch_size=8, embed_dim=64,
                    depth=2, num_heads=4, num_classes=9)
    params = fixtures.random_params(cfg, seed=7, scale=0.05)
    stacked = quant.quantize_stacked_params(
        vit.stack_params(params, cfg, param_dtype=jnp.float32), cfg)
    images = jnp.asarray(fixtures.random_images(cfg, n=4, seed=7))
    a = profiler.attribute_forward(cfg, stacked, images,
                                   compute_dtype=jnp.float32, iters=1,
                                   quant="int8-w8a8")
    assert a["total_ms"] > 0 and a["gemm_skeleton_ms"] > 0
    assert 0.0 <= a["quantize_share"] <= 1.0
    # the patched single implementation must be restored afterwards
    assert quant.quantize_act.__name__ == "quantize_act"


def test_lookup_ignores_other_device_and_bad_cache(tmp_path):
    """Tuning winners are hardware-specific: entries recorded on another
    device are ignored, and a malformed cache never raises."""
    import json

    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    key = autotune.tuning_key(CFG, 4, jnp.float32)
    autotune.save_tuning(path, key, {"attention_ipc": 2,
                                     "device": "TPU v99 imaginary"})
    assert autotune.lookup(CFG, 4, jnp.float32, path=path) == {}

    # same-device (or untagged legacy) entries are honored
    autotune.save_tuning(path, key, {"attention_ipc": 2})
    assert autotune.lookup(CFG, 4, jnp.float32,
                           path=path)["attention_ipc"] == 2

    path.write_text(json.dumps([1, 2, 3]))  # foreign/truncated file
    assert autotune.lookup(CFG, 4, jnp.float32, path=path) == {}


def test_quant_tuning_key_and_fallback(tmp_path):
    """W8A8 engines get their own tuning entries (int8 halves resident
    weight VMEM, shifting the images-per-cell optimum); when no quant sweep
    was recorded, the bf16 entry is the fallback prior."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    base = autotune.tuning_key(CFG, 4, jnp.float32)
    qkey = autotune.tuning_key(CFG, 4, jnp.float32, quant="int8-w8a8")
    assert qkey != base and qkey.endswith("|int8-w8a8")

    autotune.save_tuning(path, base, {"attention_ipc": 2})
    # no quant entry yet -> bf16 fallback
    assert autotune.lookup(CFG, 4, jnp.float32, path=path,
                           quant="int8-w8a8")["attention_ipc"] == 2
    autotune.save_tuning(path, qkey, {"attention_ipc": 4})
    assert autotune.lookup(CFG, 4, jnp.float32, path=path,
                           quant="int8-w8a8")["attention_ipc"] == 4
    # the unquantized engine never sees the quant entry
    assert autotune.lookup(CFG, 4, jnp.float32, path=path)["attention_ipc"] == 2


def test_tune_and_save_quant_sweeps_quantized_kernel(tmp_path):
    """--quant int8-w8a8 sweeps the QUANTIZED kernel variants and persists
    under the quant key."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    calls = []

    def fake_timer(fn, args, iters):
        calls.append(fn)
        return float(len(calls))

    result = autotune.tune_and_save(
        CFG, 4, dtype=jnp.float32, path=path, timer=fake_timer,
        quant="int8-w8a8",
    )
    # W8A8 never routes through the stack kernel (compile-time wall) —
    # the sweep targets the per-layer fused kernel production will run.
    assert "fused_block_ipc" in result
    assert "fused_stack_ipc" not in result
    saved = autotune.lookup(CFG, 4, jnp.float32, path=path,
                            quant="int8-w8a8")
    assert saved["fused_block_ipc"] == result["fused_block_ipc"]
    # base key untouched
    assert autotune.lookup(CFG, 4, jnp.float32, path=path) == {}


def test_tune_and_save_includes_ragged(tmp_path):
    """Round-2 verdict item 9: the ragged-vs-padded knee is measured and
    cached, and resolve_kernels threads the winner through. The sweep runs
    only for configs whose production encoder actually executes packed
    attention (per-layer class); stack-class configs skip it."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    calls = []

    def fake_timer(fn, args, iters):
        calls.append(fn)
        return float(len(calls))

    # A per-layer-class config: the 12-layer D=512 fp32 stack exceeds the
    # stack kernel's VMEM gate, so production runs packed attention.
    mid = ViTConfig(name="perf_mid", img_size=32, patch_size=8,
                    embed_dim=512, depth=12, num_heads=8, num_classes=11)
    result = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                                    timer=fake_timer)
    assert result["attention_ragged"] in (True, False)
    kern = vit.resolve_kernels("flash", tuning=result)
    assert kern["attention_packed"].keywords["ragged"] == result[
        "attention_ragged"]

    # Stack-class config (CFG's whole stack fits VMEM): no ragged sweep —
    # packed attention is dead code in its production path.
    result_small = autotune.tune_and_save(CFG, 4, dtype=jnp.float32,
                                          path=path, timer=fake_timer)
    assert "attention_ragged" not in result_small


def test_tune_and_save_knob_restriction_merges(tmp_path):
    """A knobs-restricted sweep runs only the named sweeps and MERGES into
    the existing cache entry (big-config attention sweeps can take minutes
    per compile on the relay; partial re-tunes must not drop prior knobs)."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"

    def fake_timer(fn, args, iters):
        return 1.0

    # Per-layer-class config so the attention sweep actually runs.
    mid = ViTConfig(name="perf_mid_kn", img_size=32, patch_size=8,
                    embed_dim=512, depth=12, num_heads=8, num_classes=11)
    r1 = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                                timer=fake_timer, knobs=["ipc"])
    assert "fused_block_ipc" in r1 and "attention_ipc" not in r1
    r2 = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                                timer=fake_timer, knobs=["attention"])
    # merged: the ipc winner from the first sweep survives
    assert r2["attention_ipc"] >= 1 and "fused_block_ipc" in r2
    saved = autotune.lookup(mid, 4, jnp.float32, path=path)
    assert "attention_ipc" in saved and "fused_block_ipc" in saved

    # A FULL sweep replaces rather than merges: plant a stale knob the
    # current gating would never write and confirm it is cleared.
    key = autotune.tuning_key(CFG, 4, jnp.float32)
    autotune.save_tuning(path, key, {"attention_ragged": True,
                                     "device": saved.get("device", "")})
    full = autotune.tune_and_save(CFG, 4, dtype=jnp.float32, path=path,
                                  timer=fake_timer)
    assert "attention_ragged" not in full
    assert "attention_ragged" not in autotune.lookup(CFG, 4, jnp.float32,
                                                     path=path)

    with pytest.raises(ValueError, match="unknown knobs"):
        autotune.tune_and_save(CFG, 4, dtype=jnp.float32, path=path,
                               timer=fake_timer, knobs=["bogus"])


def test_tune_blockwise_blocks_interpret():
    """Blockwise block-shape sweep mechanics (stub timer; interpret mode)."""
    from vit_with_opencl_tpu.perf import autotune

    seen = []

    def timer(fn, args, iters):
        out = np.asarray(fn(*args))
        assert np.isfinite(out).all()
        seen.append(1)
        return float(len(seen))

    (bq, bk), table = autotune.tune_blockwise_blocks(
        1536, 32, batch_heads=2, dtype=jnp.float32,
        candidates=((128, 128), (256, 256)), iters=1, timer=timer,
    )
    assert (bq, bk) == (128, 128)  # first candidate "wins" with stub timer
    assert len(table) == 2
    kern = vit.resolve_kernels(
        "flash", tuning={"blockwise_block_q": bq, "blockwise_block_k": bk})
    assert kern["attention_packed"].keywords["block_q"] == 128


def test_tune_fused_linear_blocks_interpret():
    from vit_with_opencl_tpu.perf import autotune

    seen = []

    def timer(fn, args, iters):
        out = np.asarray(fn(*args))
        assert out.shape == (64, 96)
        seen.append(1)
        return float(len(seen))

    blocks, table = autotune.tune_fused_linear_blocks(
        64, 48, 96, dtype=jnp.float32,
        candidates=((128, 512, 512), (256, 512, 512)), iters=1, timer=timer,
    )
    assert blocks == (128, 512, 512)
    assert len(table) == 2


def test_device_kernel_table_from_trace(tmp_path):
    """Per-kernel table parsed from a real jax.profiler trace — device (or
    backend-op) event spans aggregated into the reference reporter's
    totals/averages shape (ViT_opencl.c:1003-1048), replacing host
    wall-clock attribution."""
    from vit_with_opencl_tpu.perf import kernel_trace

    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b).sum(axis=0)

    a = jnp.ones((256, 256), jnp.float32)
    b = jnp.ones((256, 256), jnp.float32)
    table = kernel_trace.device_kernel_table(
        f, (a, b), iters=2, trace_dir=str(tmp_path))
    assert table, "no events parsed from the profiler trace"
    assert all(s.total_ms >= 0 and s.calls >= 1 for s in table)
    # sorted by total, descending
    totals = [s.total_ms for s in table]
    assert totals == sorted(totals, reverse=True)
    text = kernel_trace.format_kernel_table(table, iters=2)
    assert "kernel" in text and "avg ms" in text
    assert table[0].name.split("(")[0][:12] in text


def test_tune_and_save_points_accumulates(tmp_path):
    """`--points N` mode: each invocation measures at most N NEW candidates,
    merges the table into the cache, and only writes a knob's winner once
    its table is complete — so repeated short relay windows accumulate a
    big-config sweep (VERDICT r3 item 6)."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    measured = []

    def fake_timer(fn, args, iters):
        measured.append(1)
        return float(len(measured))  # earlier measurement "wins"

    # Per-layer-class config: the attention ipc sweep has 3 candidates
    # (batch 4 -> ipc 1, 2, 4) and the ragged sweep 2 more.
    mid = ViTConfig(name="perf_mid_pts", img_size=32, patch_size=8,
                    embed_dim=512, depth=12, num_heads=8, num_classes=11)
    r1 = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                                timer=fake_timer, knobs=["attention"],
                                points=2)
    assert len(measured) == 2
    assert "attention_ipc" not in r1  # incomplete: no winner yet
    assert len(r1["attention_table_ms"]) == 2
    # Engines consulting the cache mid-accumulation get no half-swept winner.
    assert "attention_ipc" not in autotune.lookup(mid, 4, jnp.float32,
                                                  path=path)

    r2 = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                                timer=fake_timer, knobs=["attention"],
                                points=2)
    assert len(measured) == 3  # only the 1 remaining candidate measured
    assert r2["attention_ipc"] == 1  # first-measured candidate won
    assert len(r2["attention_table_ms"]) == 3
    assert autotune.lookup(mid, 4, jnp.float32,
                           path=path)["attention_ipc"] == 1

    # A later points run with everything measured takes no new measurements.
    r3 = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                                timer=fake_timer, knobs=["attention"],
                                points=5)
    assert len(measured) == 3
    assert r3["attention_ipc"] == 1

    with pytest.raises(ValueError, match="points"):
        autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                               timer=fake_timer, points=0)


def test_sweep_write_through_survives_kill(tmp_path):
    """Every measured point is flushed to the cache IMMEDIATELY (round 4):
    a run killed mid-sweep (timeout on a big-config compile) must lose
    nothing already measured — simulated by a timer that dies on the
    second candidate."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    calls = []

    def dying_timer(fn, args, iters):
        calls.append(1)
        if len(calls) >= 2:
            raise KeyboardInterrupt("killed mid-sweep")
        return 1.0

    mid = ViTConfig(name="perf_mid_kill", img_size=32, patch_size=8,
                    embed_dim=512, depth=12, num_heads=8, num_classes=11)
    with pytest.raises(KeyboardInterrupt):
        autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                               timer=dying_timer, knobs=["attention"])
    # The first point survived the kill on disk.
    entry = autotune.lookup(mid, 4, jnp.float32, path=path)
    assert len(entry["attention_table_ms"]) == 1
    assert "attention_ipc" not in entry  # no half-swept winner

    # A resumed run skips the persisted point.
    r = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                               timer=lambda fn, args, iters: 1.0,
                               knobs=["attention"])
    assert len(r["attention_table_ms"]) == 3  # 1 persisted + 2 new
    assert "attention_ipc" in r


def test_points_budget_spans_knobs(tmp_path):
    """The points budget is shared across knobs in one invocation: attention
    (3 candidates) exhausts a budget of 4 after ragged's first candidate."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    n = [0]

    def fake_timer(fn, args, iters):
        n[0] += 1
        return 1.0

    mid = ViTConfig(name="perf_mid_span", img_size=32, patch_size=8,
                    embed_dim=512, depth=12, num_heads=8, num_classes=11)
    r = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                               timer=fake_timer,
                               knobs=["attention", "ragged"], points=4)
    assert n[0] == 4
    assert "attention_ipc" in r  # complete (3 measurements)
    assert "attention_ragged" not in r  # partial (1 of 2)
    assert len(r["attention_ragged_table_ms"]) == 1
    r = autotune.tune_and_save(mid, 4, dtype=jnp.float32, path=path,
                               timer=fake_timer,
                               knobs=["attention", "ragged"], points=4)
    assert n[0] == 5  # just ragged's remaining candidate
    assert "attention_ragged" in r


def test_lookup_fallback_is_tagged(tmp_path):
    """A quant lookup served from the bf16 prior is tagged with
    `fallback_from` so benchmarks can tell it from a real quant sweep
    (ADVICE r3); a real quant entry carries no tag."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"
    base = autotune.tuning_key(CFG, 4, jnp.float32)
    autotune.save_tuning(path, base, {"attention_ipc": 2})
    got = autotune.lookup(CFG, 4, jnp.float32, path=path, quant="int8-w8a8")
    assert got["attention_ipc"] == 2
    assert got["fallback_from"] == base
    # The tag is never written back into the cache.
    assert "fallback_from" not in autotune.load_tuning(path, base)

    qkey = autotune.tuning_key(CFG, 4, jnp.float32, quant="int8-w8a8")
    autotune.save_tuning(path, qkey, {"attention_ipc": 4})
    got = autotune.lookup(CFG, 4, jnp.float32, path=path, quant="int8-w8a8")
    assert got["attention_ipc"] == 4 and "fallback_from" not in got


# -- the probe methodology itself (VERDICT r3 #7) ----------------------------
# Every "X% of skeleton" bound in BENCH.md routes through
# profiler.kernel_substitutions; these tests pin that each substitution is
# output-spec-preserving and leaves the forward's GEMM sequence intact, so
# a silently-wrong skeleton can't corrupt the attribution numbers.


def _count_dots(jaxpr) -> int:
    """dot_general count, recursing into scan/cond/pjit/pallas sub-jaxprs."""
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            n += 1
        for v in eqn.params.values():
            for sub in (v if isinstance(v, (list, tuple)) else [v]):
                if hasattr(sub, "eqns"):
                    n += _count_dots(sub)
                elif hasattr(sub, "jaxpr") and hasattr(sub.jaxpr, "eqns"):
                    n += _count_dots(sub.jaxpr)
    return n


def test_kernel_substitutions_preserve_spec_and_gemm_count():
    from vit_with_opencl_tpu.perf import profiler

    params = vit.cheap_stacked_params(CFG)
    images = jnp.asarray(fixtures.random_images(CFG, n=2, seed=0),
                         jnp.bfloat16)
    kernels = vit.resolve_kernels("flash")

    def fwd(im, p):
        return vit.forward(im, p, CFG, compute_dtype=jnp.bfloat16,
                           kernels=kernels)

    base_spec = jax.eval_shape(fwd, images, params)
    base_dots = _count_dots(jax.make_jaxpr(fwd)(images, params).jaxpr)
    assert base_dots > 0
    for combo in [(True, False, False), (False, True, False),
                  (True, True, False)]:
        with profiler.kernel_substitutions(*combo):
            spec = jax.eval_shape(fwd, images, params)
            dots = _count_dots(jax.make_jaxpr(fwd)(images, params).jaxpr)
        assert (spec.shape, spec.dtype) == (base_spec.shape, base_spec.dtype)
        # The skeleton executes the SAME GEMM sequence — substitutions only
        # remove VPU work (erf, online softmax), never a matmul.
        assert dots == base_dots, combo
    # And the patch is transactional: everything restored after exit.
    assert _count_dots(jax.make_jaxpr(fwd)(images, params).jaxpr) == base_dots


def test_kernel_substitutions_w8a8_quant_cheap():
    from vit_with_opencl_tpu.models import quant as quantlib
    from vit_with_opencl_tpu.perf import profiler

    params = vit.cheap_stacked_params(CFG)
    qparams = jax.jit(
        lambda p: quantlib.quantize_stacked_params_device(p, CFG))(params)
    images = jnp.asarray(fixtures.random_images(CFG, n=2, seed=0),
                         jnp.bfloat16)
    kernels = vit.resolve_kernels("flash", w8a8=True)

    def fwd(im, p):
        return vit.forward(im, p, CFG, compute_dtype=jnp.bfloat16,
                           kernels=kernels)

    base_spec = jax.eval_shape(fwd, images, qparams)
    base_dots = _count_dots(jax.make_jaxpr(fwd)(images, qparams).jaxpr)
    for combo in [(False, False, True), (True, True, True)]:
        with profiler.kernel_substitutions(*combo):
            spec = jax.eval_shape(fwd, images, qparams)
            dots = _count_dots(jax.make_jaxpr(fwd)(images, qparams).jaxpr)
        assert (spec.shape, spec.dtype) == (base_spec.shape, base_spec.dtype)
        assert dots == base_dots, combo
    # quantize_act's stand-in keeps its exact output structure (int8
    # values + per-row fp32 scale), so downstream GEMMs are unchanged.
    x = jnp.zeros((4, CFG.embed_dim), jnp.float32)
    real = jax.eval_shape(quantlib.quantize_act, x)
    with profiler.kernel_substitutions(False, False, True):
        fake = jax.eval_shape(quantlib.quantize_act, x)
    assert jax.tree.map(lambda s: (s.shape, str(s.dtype)), real) == \
        jax.tree.map(lambda s: (s.shape, str(s.dtype)), fake)


def test_kernel_substitutions_reentrancy_guard_still_works():
    """attribute_forward still refuses concurrent use after the refactor."""
    from vit_with_opencl_tpu.perf import profiler

    params = vit.cheap_stacked_params(CFG)
    images = jnp.asarray(fixtures.random_images(CFG, n=2, seed=0),
                         jnp.bfloat16)
    assert profiler._ATTRIBUTION_LOCK.acquire(blocking=False)
    try:
        with pytest.raises(RuntimeError, match="already running"):
            profiler.attribute_forward(CFG, params, images, iters=1)
    finally:
        profiler._ATTRIBUTION_LOCK.release()


def test_tune_and_save_train_entry(tmp_path):
    """quant='train' sweeps the TRAINING kernel set: the stack kernel is
    never the training route (no VJP), so the packed-attention fwd sweep
    runs even for stack-class configs, plus the backward kernel's own knob
    (attention_bwd_ipc) — the entry Trainer(batch_size=...) consults."""
    from vit_with_opencl_tpu.perf import autotune

    path = tmp_path / "tuning.json"

    def fake_timer(fn, args, iters):
        fake_timer.n += 1
        return float(fake_timer.n)  # first candidate of each sweep wins

    fake_timer.n = 0
    result = autotune.tune_and_save(
        CFG, 4, dtype=jnp.float32, path=path, timer=fake_timer,
        quant="train",
    )
    assert "attention_ipc" in result
    assert "attention_bwd_ipc" in result
    assert "fused_stack_ipc" not in result  # training never runs the stack
    saved = autotune.lookup(CFG, 4, jnp.float32, path=path, quant="train")
    assert saved["attention_bwd_ipc"] == result["attention_bwd_ipc"]
    # No train entry at another batch: falls back to the base (inference)
    # key when one exists, tagged so callers can tell.
    autotune.save_tuning(path, autotune.tuning_key(CFG, 8, jnp.float32),
                         {"attention_ipc": 2,
                          "device": str(jax.devices()[0])})
    fb = autotune.lookup(CFG, 8, jnp.float32, path=path, quant="train")
    assert fb["attention_ipc"] == 2 and "fallback_from" in fb


def test_autotune_attention_bwd_ipc_interpret():
    """Selection mechanics of the backward-kernel sweep (stub timer)."""
    from vit_with_opencl_tpu.perf import autotune

    best, table = autotune.tune_attention_bwd_ipc(
        CFG, batch=4, dtype=jnp.float32, candidates=(1, 2, 3, 4),
        timer=lambda fn, args, iters: 1.0,
    )
    assert set(table) == {1, 2, 4}  # 3 doesn't divide the batch
    assert best in table
