"""Profiler smoke tests (CPU)."""

import jax.numpy as jnp
import numpy as np

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
