"""Multi-chip sharding on the virtual 8-device CPU mesh: TP parity vs
single-device, DP forward, GSPMD training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import golden, vit
from vit_with_opencl_tpu.parallel import spmd

CFG = ViTConfig(
    name="par_small",
    img_size=32,
    patch_size=8,
    embed_dim=64,
    depth=2,
    num_heads=4,
    num_classes=17,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    params_named = fixtures.random_params(CFG, seed=3, scale=0.05)
    images = fixtures.random_images(CFG, n=8, seed=4)
    ref = golden.golden_forward(images, params_named, CFG)
    stacked = vit.stack_params(params_named, CFG, param_dtype=jnp.float32)
    return stacked, images, ref


def test_tp_forward_matches_golden(setup):
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(stacked, mesh, CFG)
    probs = spmd.tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_tp_forward_flash_kernel_matches_golden(setup):
    """TP path with the packed Pallas attention kernel (per-head packing)."""
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=2)
    params = spmd.shard_params_tp(stacked, mesh, CFG)
    probs = spmd.tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32,
        attention_impl="flash",
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_tp_forward_head_dim_104_vit_g_geometry():
    """TP at ViT-G/14's head geometry (head_dim=104, neither 64 nor a power
    of two): the head-major relayout and per-shard attention must stay
    golden-exact. ViT-G is the preset whose bf16 weights exceed the fused
    VMEM gate — TP sharding is its multi-chip story."""
    cfg = ViTConfig(name="g_par", img_size=32, patch_size=8, embed_dim=208,
                    depth=2, num_heads=2, num_classes=9)
    assert cfg.head_dim == 104
    named = fixtures.random_params(cfg, seed=13, scale=0.05)
    images = fixtures.random_images(cfg, n=4, seed=13)
    ref = golden.golden_forward(images, named, cfg)
    stacked = vit.stack_params(named, cfg, param_dtype=jnp.float32)
    mesh = spmd.make_mesh(data=2, model=2)
    params = spmd.shard_params_tp(stacked, mesh, cfg)
    probs = spmd.tp_forward(
        jnp.asarray(images), params, cfg, mesh, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_tp_layout_reorder_roundtrip(setup):
    stacked, _, _ = setup
    tp = spmd.to_tp_layout(stacked, CFG)
    # One head group of qkv_w must equal the gathered q/k/v slices of the
    # original layout for that head.
    L, d, nh, hd = CFG.depth, CFG.embed_dim, CFG.num_heads, CFG.head_dim
    orig = np.asarray(stacked["layers"]["qkv_w"])  # [L, D, 3D] packed q|k|v
    re = np.asarray(tp["layers"]["qkv_w"]).reshape(L, d, nh, 3, hd)
    for h in range(nh):
        np.testing.assert_array_equal(
            re[:, :, h, 0], orig[:, :, h * hd : (h + 1) * hd]
        )
        np.testing.assert_array_equal(
            re[:, :, h, 1], orig[:, :, d + h * hd : d + (h + 1) * hd]
        )
        np.testing.assert_array_equal(
            re[:, :, h, 2], orig[:, :, 2 * d + h * hd : 2 * d + (h + 1) * hd]
        )


def test_tp_rejects_indivisible_mesh(setup):
    stacked, _, _ = setup
    mesh = spmd.make_mesh(data=1, model=3)
    with pytest.raises(ValueError, match="not divisible"):
        spmd.shard_params_tp(stacked, mesh, CFG)


def test_dp_forward_matches_golden(setup):
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=8, model=1)
    fwd = spmd.dp_forward_fn(CFG, mesh, compute_dtype=jnp.float32)
    probs = fwd(jnp.asarray(images), stacked)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_gspmd_train_step_runs_and_descends(setup):
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_gspmd(stacked, mesh, CFG)
    labels = jnp.arange(8) % CFG.num_classes
    step = spmd.make_train_step(CFG, mesh, lr=1e-2)
    imgs = jnp.asarray(images)
    params, loss0 = step(params, imgs, labels)
    for _ in range(3):
        params, loss = step(params, imgs, labels)
    assert float(loss) < float(loss0)
    assert np.isfinite(float(loss))


def test_grad_accum_matches_full_batch(setup):
    """grad_accum=A is the full-batch update exactly (mean of equal-size
    microbatch means), so one accumulated step must match one plain step."""
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=2, model=4)
    labels = jnp.arange(8) % CFG.num_classes
    imgs = jnp.asarray(images)
    step1 = spmd.make_train_step(CFG, mesh, lr=1e-2)
    step4 = spmd.make_train_step(CFG, mesh, lr=1e-2, grad_accum=4)
    p1 = spmd.shard_params_gspmd(stacked, mesh, CFG)
    p4 = spmd.shard_params_gspmd(stacked, mesh, CFG)
    p1, loss1 = step1(p1, imgs, labels)
    p4, loss4 = step4(p4, imgs, labels)
    np.testing.assert_allclose(float(loss4), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        p1, p4,
    )
    with pytest.raises(ValueError, match="not divisible"):
        step_bad = spmd.make_train_step(CFG, mesh, lr=1e-2, grad_accum=3)
        step_bad(p1, imgs, labels)


def test_scan_unroll_matches_default(setup):
    """scan_unroll fully unrolls the encoder layer loop (the relay-compiler
    dodge for grad-through-while at D>=768); the update must be identical."""
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=2, model=4)
    labels = jnp.arange(8) % CFG.num_classes
    imgs = jnp.asarray(images)
    step1 = spmd.make_train_step(CFG, mesh, lr=1e-2)
    stepu = spmd.make_train_step(CFG, mesh, lr=1e-2, scan_unroll=CFG.depth)
    p1 = spmd.shard_params_gspmd(stacked, mesh, CFG)
    pu = spmd.shard_params_gspmd(stacked, mesh, CFG)
    p1, loss1 = step1(p1, imgs, labels)
    pu, lossu = stepu(pu, imgs, labels)
    np.testing.assert_allclose(float(lossu), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        p1, pu,
    )


def test_pipeline_forward_matches_golden(setup):
    from vit_with_opencl_tpu.parallel import pipeline

    stacked, images, ref = setup
    mesh = pipeline.make_pipe_mesh(2)  # 2 stages x 1 layer... depth=2
    params = pipeline.shard_params_pp(stacked, mesh, CFG)
    probs = pipeline.pp_forward(
        jnp.asarray(images), params, CFG, mesh, n_microbatches=4,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_pipeline_rejects_indivisible(setup):
    from vit_with_opencl_tpu.parallel import pipeline

    stacked, images, _ = setup
    mesh = pipeline.make_pipe_mesh(2)
    params = pipeline.shard_params_pp(stacked, mesh, CFG)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline.pp_forward(jnp.asarray(images), params, CFG, mesh,
                            n_microbatches=3)
    mesh5 = pipeline.make_pipe_mesh(5)
    with pytest.raises(ValueError, match="pipeline stages"):
        pipeline.shard_params_pp(stacked, mesh5, CFG)


def test_sp_forward_matches_golden(setup):
    """Sequence/context parallelism: tokens sharded over 'model' (17 tokens
    pad to 20 across 4 shards), KV all-gathered with padding masked."""
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = jax.device_put(stacked)
    probs = spmd.sp_forward(
        jnp.asarray(images), stacked, CFG, mesh, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_multihost_mesh_single_process(setup):
    """Hybrid mesh construction degrades to a plain mesh when single-process;
    DP inference over it matches golden."""
    from vit_with_opencl_tpu.parallel import multihost

    multihost.initialize()  # no-op single process
    mesh = multihost.make_hybrid_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="must divide"):
        multihost.make_hybrid_mesh(model=3)
    with pytest.raises(ValueError, match="exceeds local"):
        multihost.make_hybrid_mesh(model=16)
    stacked, images, ref = setup
    params = spmd.shard_params_tp(stacked, mesh, CFG)
    probs = spmd.tp_forward(jnp.asarray(images), params, CFG, mesh,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)


def test_pipeline_with_quantized_params(setup):
    """PP + int8 weight-only quantization (review finding: the replicated
    head crashed on quantized head_w)."""
    from vit_with_opencl_tpu.models import quant
    from vit_with_opencl_tpu.parallel import pipeline

    stacked, images, ref = setup
    qp = quant.quantize_stacked_params(stacked, CFG)
    mesh = pipeline.make_pipe_mesh(2)
    params = pipeline.shard_params_pp(qp, mesh, CFG)
    probs = pipeline.pp_forward(
        jnp.asarray(images), params, CFG, mesh, n_microbatches=2,
        compute_dtype=jnp.float32,
    )
    assert np.abs(np.asarray(probs) - ref).max() < 5e-3


def test_adamw_train_step_descends(setup):
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_gspmd(stacked, mesh, CFG)
    labels = jnp.arange(8) % CFG.num_classes
    init_fn, step = spmd.make_train_step(CFG, mesh, lr=1e-3,
                                         optimizer="adamw")
    opt_state = init_fn(params)
    imgs = jnp.asarray(images)
    params, opt_state, loss0 = step(params, opt_state, imgs, labels)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, imgs, labels)
    assert float(loss) < float(loss0)
    with pytest.raises(ValueError, match="unknown optimizer"):
        spmd.make_train_step(CFG, mesh, optimizer="lion")


def test_train_step_flash_kernels_descend(setup):
    """Training with the Pallas attention (fwd + fused bwd kernel) descends
    and matches the xla-attention gradients' direction."""
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_gspmd(stacked, mesh, CFG)
    labels = jnp.arange(8) % CFG.num_classes
    step = spmd.make_train_step(CFG, mesh, lr=1e-2, attention_impl="flash")
    imgs = jnp.asarray(images)
    params, loss0 = step(params, imgs, labels)
    for _ in range(3):
        params, loss = step(params, imgs, labels)
    assert float(loss) < float(loss0)
    assert np.isfinite(float(loss))


def test_parallel_paths_bf16_smoke(setup):
    """bf16 compute through tp/sp/pp: compiles, runs, stays within the
    comparator gate of the fp32 golden result."""
    stacked_f32, images, ref = setup
    import jax.numpy as jnp
    from vit_with_opencl_tpu.models import vit as vitmod
    from vit_with_opencl_tpu.harness import fixtures as fx
    from vit_with_opencl_tpu.parallel import pipeline

    named = fx.random_params(CFG, seed=3, scale=0.05)
    stacked = vitmod.stack_params(named, CFG, param_dtype=jnp.bfloat16)
    imgs = jnp.asarray(images)

    mesh = spmd.make_mesh(data=2, model=2)
    p_tp = spmd.shard_params_tp(stacked, mesh, CFG)
    tp = np.asarray(spmd.tp_forward(imgs, p_tp, CFG, mesh,
                                    compute_dtype=jnp.bfloat16))
    sp = np.asarray(spmd.sp_forward(imgs, stacked, CFG, mesh,
                                    compute_dtype=jnp.bfloat16))
    pmesh = pipeline.make_pipe_mesh(2)
    p_pp = pipeline.shard_params_pp(stacked, pmesh, CFG)
    pp = np.asarray(pipeline.pp_forward(imgs, p_pp, CFG, pmesh,
                                        n_microbatches=2,
                                        compute_dtype=jnp.bfloat16))
    for name, got in [("tp", tp), ("sp", sp), ("pp", pp)]:
        assert np.isfinite(got).all(), name
        assert np.abs(got - ref).max() < 5e-3, name
        assert (got.argmax(-1) == ref.argmax(-1)).all(), name


def test_sp_forward_ring_matches_golden(setup):
    """Sequence parallelism with ring-rotated KV (kv='ring') — ring attention
    wired into a real model forward, not just the orphan op."""
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=4)
    probs = spmd.sp_forward(
        jnp.asarray(images), stacked, CFG, mesh, compute_dtype=jnp.float32,
        kv="ring",
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)
    with pytest.raises(ValueError, match="kv strategy"):
        spmd.sp_forward(jnp.asarray(images), stacked, CFG, mesh, kv="warp")


def test_train_step_flash_long_seq_descends():
    """make_train_step(attention_impl='flash') on a T>=2048 config: the
    custom VJP must route both directions through the blockwise kernels
    (nothing [T, T]-shaped) and still descend."""
    long_cfg = ViTConfig(
        name="par_long", img_size=368, patch_size=8, embed_dim=64,
        depth=1, num_heads=1, num_classes=5,
    )
    assert long_cfg.num_tokens >= 2048  # 46*46+1 = 2117
    mesh = spmd.make_mesh(data=2, model=1)
    params = vit.random_stacked_params(long_cfg, jax.random.key(0),
                                       param_dtype=jnp.float32)
    params = spmd.shard_params_gspmd(params, mesh, long_cfg)
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, 3, 368, 368)).astype(np.float32))
    labels = jnp.arange(2) % long_cfg.num_classes
    step = spmd.make_train_step(long_cfg, mesh, lr=1e-2,
                                attention_impl="flash")
    params, loss0 = step(params, images, labels)
    for _ in range(2):
        params, loss = step(params, images, labels)
    assert np.isfinite(float(loss))
    assert float(loss) < float(loss0)


def test_tp_forward_int8_quantized(setup):
    """TP + int8 weight-only quantization: shard_params_tp must re-layout
    the quantized {q, scale} dicts head-major together (VERDICT r1 item 2:
    previously crashed with an opaque AttributeError in to_tp_layout)."""
    from vit_with_opencl_tpu.models import quant

    stacked, images, ref = setup
    qp = quant.quantize_stacked_params(stacked, CFG)
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(qp, mesh, CFG)
    probs = spmd.tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32
    )
    got = np.asarray(probs)
    assert np.abs(got - ref).max() < 5e-3  # int8 error, same gate as PP test
    assert (got.argmax(-1) == ref.argmax(-1)).all()

    # And with the packed Pallas attention kernel (per-head packing).
    mesh2 = spmd.make_mesh(data=2, model=2)
    params2 = spmd.shard_params_tp(qp, mesh2, CFG)
    probs2 = spmd.tp_forward(
        jnp.asarray(images), params2, CFG, mesh2, compute_dtype=jnp.float32,
        attention_impl="flash",
    )
    assert np.abs(np.asarray(probs2) - ref).max() < 5e-3


def test_tp_forward_w8a8(setup):
    """TP + W8A8 dynamic activation quantization: the per-token activation
    scale is shard-local and commutes with the row-parallel psum, so the
    composed path needs no extra collectives and stays within the int8
    accuracy gate."""
    from vit_with_opencl_tpu.models import quant

    stacked, images, ref = setup
    qp = quant.quantize_stacked_params(stacked, CFG)
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(qp, mesh, CFG)
    probs = spmd.tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32,
        w8a8=True,
    )
    got = np.asarray(probs)
    assert np.abs(got - ref).max() < 1e-2  # comparator gate
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_sp_tp_forward_w8a8(setup):
    """SP x TP + W8A8: token-sharded activations, model-sharded int8 weights,
    int8 GEMMs after each all-gather."""
    from vit_with_opencl_tpu.models import quant

    stacked, images, ref = setup
    qp = quant.quantize_stacked_params(stacked, CFG)
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(qp, mesh, CFG)
    probs = spmd.sp_tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32,
        w8a8=True,
    )
    got = np.asarray(probs)
    assert np.abs(got - ref).max() < 1e-2
    assert (got.argmax(-1) == ref.argmax(-1)).all()


@pytest.fixture(scope="module")
def outlier_params(setup):
    """Calibrated outlier-aware W8A8 dicts for the shared small config."""
    from vit_with_opencl_tpu.models import quant

    stacked, _, _ = setup
    calib = fixtures.random_images(CFG, n=8, seed=40)
    return quant.calibrate_w8a8(calib, stacked, CFG)


def test_tp_forward_w8a8_outlier(setup, outlier_params):
    """TP + calibrated outlier-aware W8A8 (VERDICT r4 #5): the accuracy
    mode must ride the same multi-chip path plain W8A8 was tested on.
    qkv/fc1 hi groups shard their out axis; out-proj hi rows shard by head
    group; fc2 converts to the masked-trailing form whose hot tail lives in
    the last shard's hidden slice."""
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(outlier_params, mesh, CFG)
    probs = spmd.tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32,
        w8a8=True,
    )
    got = np.asarray(probs)
    assert np.abs(got - ref).max() < 1e-2  # comparator gate
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_sp_tp_forward_w8a8_outlier(setup, outlier_params):
    """SP x TP + outlier-aware W8A8 — token-sharded activations, same dicts."""
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(outlier_params, mesh, CFG)
    probs = spmd.sp_tp_forward(
        jnp.asarray(images), params, CFG, mesh, compute_dtype=jnp.float32,
        w8a8=True,
    )
    got = np.asarray(probs)
    assert np.abs(got - ref).max() < 1e-2
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_tp_outlier_requires_w8a8(setup, outlier_params):
    """Outlier dicts through the TP path without w8a8 must fail loudly, not
    silently drop the bf16 hi contribution."""
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(outlier_params, mesh, CFG)
    with pytest.raises(ValueError, match="hi"):
        spmd.tp_forward(
            jnp.asarray(images), params, CFG, mesh,
            compute_dtype=jnp.float32, w8a8=False,
        )


def test_tp_outlier_fc2_group_must_fit_shard(setup):
    """fc2's global trailing outlier group must fit one model shard's hidden
    slice; a too-wide plan raises a typed error at shard time (not wrong
    numerics at run time)."""
    from vit_with_opencl_tpu.models import quant

    stacked, _, _ = setup
    calib = fixtures.random_images(CFG, n=4, seed=41)
    # hidden_dim = 256, model axis 4 -> shard slice 64; force k_h = 96.
    qo = quant.calibrate_w8a8(calib, stacked, CFG, k_h=96)
    mesh = spmd.make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="outlier group"):
        spmd.shard_params_tp(qo, mesh, CFG)


def test_pp_train_step_matches_gspmd(setup):
    """Pipeline-parallel TRAINING (VERDICT r4 #4): one GPipe-scheduled SGD
    step must produce the same loss and updated params as the GSPMD step on
    the same data — the backward schedule is the exact transpose of the
    staged forward (cotangents rotate S−1→0 through the ring)."""
    from vit_with_opencl_tpu.parallel import pipeline

    stacked, images, _ = setup
    labels = np.arange(8) % CFG.num_classes

    # Reference: plain GSPMD SGD step on a trivial mesh.
    ref_mesh = spmd.make_mesh(data=1, model=1)
    ref_step = spmd.make_train_step(CFG, ref_mesh, lr=1e-2,
                                    compute_dtype=jnp.float32)
    ref_params, ref_loss = ref_step(stacked, jnp.asarray(images),
                                    jnp.asarray(labels))

    pmesh = pipeline.make_pipe_mesh(2)
    pp_params = pipeline.shard_params_pp(stacked, pmesh, CFG)
    step = pipeline.pp_train_step(CFG, pmesh, n_microbatches=2, lr=1e-2,
                                  compute_dtype=jnp.float32)
    new_params, loss = step(pp_params, jnp.asarray(images),
                            jnp.asarray(labels))
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    for key in ("qkv_w", "fc2_w", "ln1_w"):
        np.testing.assert_allclose(
            np.asarray(new_params["layers"][key]),
            np.asarray(ref_params["layers"][key]), atol=2e-5, rtol=1e-4)
    for key in ("patch_w", "pos_emb", "head_w", "final_ln_w"):
        np.testing.assert_allclose(
            np.asarray(new_params[key]), np.asarray(ref_params[key]),
            atol=2e-5, rtol=1e-4)
    # loss must descend over a few steps
    prev = float(loss)
    p = new_params
    for _ in range(2):
        p, loss = step(p, jnp.asarray(images), jnp.asarray(labels))
    assert float(loss) < prev


def test_pp_train_step_interleaved_and_guards():
    """Interleaved-schedule (v=2, waves) training parity on a depth-4 config
    + the layout-mismatch guard."""
    from vit_with_opencl_tpu.parallel import pipeline

    cfg = ViTConfig(name="pp_train_i", img_size=32, patch_size=8,
                    embed_dim=64, depth=4, num_heads=4, num_classes=13)
    named = fixtures.random_params(cfg, seed=17, scale=0.05)
    images = fixtures.random_images(cfg, n=8, seed=18)
    labels = np.arange(8) % cfg.num_classes
    stacked = vit.stack_params(named, cfg, param_dtype=jnp.float32)

    ref_mesh = spmd.make_mesh(data=1, model=1)
    ref_step = spmd.make_train_step(cfg, ref_mesh, lr=1e-2,
                                    compute_dtype=jnp.float32)
    ref_params, ref_loss = ref_step(stacked, jnp.asarray(images),
                                    jnp.asarray(labels))

    pmesh = pipeline.make_pipe_mesh(2)
    ppi = pipeline.shard_params_pp(stacked, pmesh, cfg, interleave=2)
    step = pipeline.pp_train_step(cfg, pmesh, n_microbatches=4, lr=1e-2,
                                  compute_dtype=jnp.float32, interleave=2)
    new_params, loss = step(ppi, jnp.asarray(images), jnp.asarray(labels))
    assert abs(float(loss) - float(ref_loss)) < 1e-5  # M=4 > S: wave path
    # Updated layer stack matches after undoing the interleave permutation.
    perm = np.asarray(pipeline._interleave_perm(cfg.depth, 2, 2))
    got_qkv = np.asarray(new_params["layers"]["qkv_w"])
    np.testing.assert_allclose(
        got_qkv, np.asarray(ref_params["layers"]["qkv_w"])[perm],
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_params["head_w"]), np.asarray(ref_params["head_w"]),
        atol=2e-5, rtol=1e-4)

    # Layout guard: v=2 params through a v=1 step must fail loudly.
    with pytest.raises(ValueError, match="interleave"):
        pipeline.pp_train_step(cfg, pmesh, n_microbatches=2)(
            ppi, jnp.asarray(images), jnp.asarray(labels))


def test_pp_train_step_1f1b_matches_gspmd(setup):
    """Explicit 1F1B schedule (bounded 2S-slot stash ring + remat backward):
    one SGD step must match the GSPMD step bit-for-close — and M=6 > 2·S
    exercises stash-ring reuse (slots wrap m mod 2S) plus the steady-state
    one-forward-one-backward interleave."""
    from vit_with_opencl_tpu.parallel import pipeline

    stacked, images, _ = setup
    # 16 images so M=8 microbatches of 2 — ring slots (2S=4) wrap twice.
    rng = np.random.default_rng(99)
    images16 = np.concatenate([images, images[::-1]], axis=0)
    labels = rng.integers(0, CFG.num_classes, size=16).astype(np.int32)

    ref_mesh = spmd.make_mesh(data=1, model=1)
    ref_step = spmd.make_train_step(CFG, ref_mesh, lr=1e-2,
                                    compute_dtype=jnp.float32)
    ref_params, ref_loss = ref_step(stacked, jnp.asarray(images16),
                                    jnp.asarray(labels))

    pmesh = pipeline.make_pipe_mesh(2)
    pp_params = pipeline.shard_params_pp(stacked, pmesh, CFG)
    step = pipeline.pp_train_step_1f1b(CFG, pmesh, n_microbatches=8,
                                       lr=1e-2, compute_dtype=jnp.float32)
    new_params, loss = step(pp_params, jnp.asarray(images16),
                            jnp.asarray(labels))
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    for key in ("qkv_w", "fc2_w", "ln1_w"):
        np.testing.assert_allclose(
            np.asarray(new_params["layers"][key]),
            np.asarray(ref_params["layers"][key]), atol=2e-5, rtol=1e-4)
    for key in ("patch_w", "pos_emb", "prefix_tokens", "head_w",
                "final_ln_w"):
        np.testing.assert_allclose(
            np.asarray(new_params[key]), np.asarray(ref_params[key]),
            atol=2e-5, rtol=1e-4)
    # Loss must descend over a few steps through the same schedule.
    prev = float(loss)
    p = new_params
    for _ in range(2):
        p, loss = step(p, jnp.asarray(images16), jnp.asarray(labels))
    assert float(loss) < prev


def test_pp_train_step_1f1b_soft_labels_and_guards(setup):
    """Soft-label (Mixup) parity vs the autodiff-GPipe step + layout/quant
    guards."""
    from vit_with_opencl_tpu.models import quant
    from vit_with_opencl_tpu.parallel import pipeline

    stacked, images, _ = setup
    rng = np.random.default_rng(5)
    soft = rng.dirichlet(np.ones(CFG.num_classes), size=8).astype(np.float32)

    pmesh = pipeline.make_pipe_mesh(2)
    pp_params = pipeline.shard_params_pp(stacked, pmesh, CFG)
    ref_step = pipeline.pp_train_step(CFG, pmesh, n_microbatches=4, lr=1e-2,
                                      compute_dtype=jnp.float32,
                                      label_smoothing=0.1)
    ref_params, ref_loss = ref_step(pp_params, jnp.asarray(images),
                                    jnp.asarray(soft))
    step = pipeline.pp_train_step_1f1b(CFG, pmesh, n_microbatches=4, lr=1e-2,
                                       compute_dtype=jnp.float32,
                                       label_smoothing=0.1)
    new_params, loss = step(pp_params, jnp.asarray(images), jnp.asarray(soft))
    assert abs(float(loss) - float(ref_loss)) < 1e-5
    np.testing.assert_allclose(
        np.asarray(new_params["layers"]["fc1_w"]),
        np.asarray(ref_params["layers"]["fc1_w"]), atol=2e-5, rtol=1e-4)

    # Interleaved layouts are rejected (the 1F1B ring assumes plain layout).
    cfg4 = ViTConfig(name="pp_1f1b_g", img_size=32, patch_size=8,
                     embed_dim=64, depth=4, num_heads=4, num_classes=13)
    named = fixtures.random_params(cfg4, seed=21, scale=0.05)
    st4 = vit.stack_params(named, cfg4, param_dtype=jnp.float32)
    ppi = pipeline.shard_params_pp(st4, pmesh, cfg4, interleave=2)
    with pytest.raises(ValueError, match="interleave"):
        pipeline.pp_train_step_1f1b(cfg4, pmesh, n_microbatches=2)(
            ppi, jnp.asarray(images), jnp.asarray(soft))

    # Quantized params are rejected loudly.
    qp = dict(pp_params)
    qp["layers"] = dict(pp_params["layers"])
    qp["layers"]["qkv_w"] = {
        "q": np.zeros((2, 64, 192), np.int8), "scale": np.ones((2, 1, 192))}
    assert quant.is_quantized(qp["layers"]["qkv_w"])
    with pytest.raises(ValueError, match="quantize"):
        pipeline.pp_train_step_1f1b(CFG, pmesh, n_microbatches=4)(
            qp, jnp.asarray(images), jnp.asarray(soft))


def test_pipeline_interleaved_matches_golden():
    """Interleaved virtual-stage PP (v=2): same numbers as golden, fewer
    bubble cycles — VERDICT r1 item 8 (stages previously burned full-stage
    compute on garbage during fill/drain)."""
    from vit_with_opencl_tpu.parallel import pipeline

    cfg = ViTConfig(name="pp_inter", img_size=32, patch_size=8, embed_dim=64,
                    depth=4, num_heads=4, num_classes=13)
    named = fixtures.random_params(cfg, seed=7, scale=0.05)
    images = fixtures.random_images(cfg, n=4, seed=8)
    ref = golden.golden_forward(images, named, cfg)
    stacked = vit.stack_params(named, cfg, param_dtype=jnp.float32)

    mesh = pipeline.make_pipe_mesh(2)
    params = pipeline.shard_params_pp(stacked, mesh, cfg, interleave=2)
    probs = pipeline.pp_forward(
        jnp.asarray(images), params, cfg, mesh, n_microbatches=2,
        compute_dtype=jnp.float32, interleave=2,
    )
    np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)

    # Bubble accounting: v=2 must strictly beat GPipe.
    gpipe = pipeline.bubble_fraction(2, 2, interleave=1)
    inter = pipeline.bubble_fraction(2, 2, interleave=2)
    assert inter < gpipe
    assert np.isclose(gpipe, 1 - 2 / 3)
    assert np.isclose(inter, 1 - 4 / 5)  # 1 - vM/(M+vS-1)

    # M > S runs as back-to-back waves (round-2 verdict item 5: the
    # framework does the wave scheduling, not the caller).
    probs_waves = pipeline.pp_forward(
        jnp.asarray(images), params, cfg, mesh, n_microbatches=4,
        compute_dtype=jnp.float32, interleave=2,
    )
    np.testing.assert_allclose(np.asarray(probs_waves), ref, atol=1e-5)
    # Wave bubble: M=4, S=2, V=2 -> W=2, total (2-1)*4 + 1 + 4 = 9 steps of
    # half-stage work, useful 8 -> 1/9 bubble; GPipe M=4,S=2 is 1 - 4/5.
    waves = pipeline.bubble_fraction(4, 2, interleave=2)
    assert np.isclose(waves, 1 - 8 / 9)
    assert waves < pipeline.bubble_fraction(4, 2, interleave=1)

    # Ragged last wave (M=3 on S=2): partial-wave slots mask out cleanly.
    names3 = fixtures.random_images(cfg, n=6, seed=9)
    ref3 = golden.golden_forward(names3, named, cfg)
    probs3 = pipeline.pp_forward(
        jnp.asarray(names3), params, cfg, mesh, n_microbatches=3,
        compute_dtype=jnp.float32, interleave=2,
    )
    np.testing.assert_allclose(np.asarray(probs3), ref3, atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        pipeline.shard_params_pp(stacked, mesh, cfg, interleave=3)


def test_multihost_mesh_math_multiprocess(monkeypatch):
    """Pin the hybrid-mesh math for the multi-process branch without a real
    cluster (VERDICT r1 weak 7): fake process/device counts and capture the
    DCNxICI shapes handed to mesh_utils."""
    from jax.experimental import mesh_utils

    from vit_with_opencl_tpu.parallel import multihost

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "device_count", lambda: 8)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    captured = {}

    def fake_hybrid(mesh_shape, dcn_mesh_shape):
        captured["mesh_shape"] = tuple(mesh_shape)
        captured["dcn_mesh_shape"] = tuple(dcn_mesh_shape)
        return np.asarray(jax.devices()[:8])

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", fake_hybrid)

    mesh = multihost.make_hybrid_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    # data splits as (processes x per-host data); model stays inside ICI.
    assert captured["mesh_shape"] == (2, 2)
    assert captured["dcn_mesh_shape"] == (2, 1)

    # TP axis crossing a host boundary must be refused.
    with pytest.raises(ValueError, match="exceeds local"):
        multihost.make_hybrid_mesh(model=8)


def test_multihost_initialize_env_forwarding(monkeypatch):
    """initialize() forwards explicit/env cluster coordinates and treats
    'not in a cluster' auto-detection failure as the single-process no-op."""
    from vit_with_opencl_tpu.parallel import multihost

    calls = []

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        if coordinator_address is None and num_processes is None:
            raise RuntimeError("no cluster detected")
        calls.append((coordinator_address, num_processes, process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)

    multihost.initialize()  # auto-detect fails -> no-op, no raise
    assert calls == []

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    monkeypatch.setenv("JAX_PROCESS_COUNT", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "3")
    multihost.initialize()
    assert calls == [("10.0.0.1:8476", 4, 3)]

    # Explicit args beat env vars.
    multihost.initialize("10.9.9.9:1234", 2, 1)
    assert calls[-1] == ("10.9.9.9:1234", 2, 1)


def test_pp_interleave_layout_mismatch_raises():
    """Params laid out for one interleave factor must not silently run a
    different schedule (the layer order would be wrong)."""
    from vit_with_opencl_tpu.parallel import pipeline

    cfg = CFG
    named = fixtures.random_params(cfg, seed=8, scale=0.05)
    stacked = vit.stack_params(named, cfg, param_dtype=jnp.float32)
    mesh = pipeline.make_pipe_mesh(2)
    sharded = pipeline.shard_params_pp(stacked, mesh, cfg, interleave=1)
    images = jnp.asarray(fixtures.random_images(cfg, n=4, seed=8))
    with pytest.raises(ValueError, match="interleave"):
        pipeline.pp_forward(images, sharded, cfg, mesh,
                            n_microbatches=2, interleave=2)


def test_train_step_fused_layer_descends_and_matches(setup):
    """attention_impl='fused': every encoder layer trains through ONE Pallas
    kernel in both directions. Must descend and track the per-op xla step
    (erf vs tanh-poly GELU differ by <= 3.4e-6 pointwise)."""
    stacked, images, _ = setup
    mesh = spmd.make_mesh(data=1, model=1)
    labels = jnp.arange(8) % CFG.num_classes
    imgs = jnp.asarray(images)

    from vit_with_opencl_tpu.ops import fused_block

    assert fused_block.supports_trainable(CFG, dtype_bytes=4)
    step_f = spmd.make_train_step(CFG, mesh, lr=1e-2, attention_impl="fused")
    step_x = spmd.make_train_step(CFG, mesh, lr=1e-2, attention_impl="xla")

    pf, loss_f0 = step_f(stacked, imgs, labels)
    px, loss_x0 = step_x(stacked, imgs, labels)
    np.testing.assert_allclose(float(loss_f0), float(loss_x0), atol=1e-4)
    for key in ("qkv_w", "fc1_w", "out_w", "fc2_w", "ln1_w"):
        a = np.asarray(pf["layers"][key])
        b = np.asarray(px["layers"][key])
        atol = 1e-4 * max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, atol=atol,
                                   err_msg=f"updated {key!r} diverged")
    loss_prev = loss_f0
    for _ in range(3):
        pf, loss = step_f(pf, imgs, labels)
    assert float(loss) < float(loss_f0)
    assert np.isfinite(float(loss))


def test_sp_tp_forward_matches_golden(setup):
    """Composed sequence x tensor parallelism: token-sharded activations,
    model-sharded weights, AG/RS per block. Parity vs golden on 2x4."""
    stacked, images, ref = setup
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(stacked, mesh, CFG)
    for impl in ("xla", "flash"):
        probs = spmd.sp_tp_forward(
            jnp.asarray(images), params, CFG, mesh,
            compute_dtype=jnp.float32, attention_impl=impl,
        )
        np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5,
                                   err_msg=f"impl={impl}")


def test_sp_tp_forward_bf16_smoke(setup):
    """bf16 production path through SP x TP stays inside the comparator
    gate vs the fp32 golden."""
    _, images, ref = setup
    from vit_with_opencl_tpu.harness import fixtures as fx

    named = fx.random_params(CFG, seed=3, scale=0.05)
    stacked16 = vit.stack_params(named, CFG, param_dtype=jnp.bfloat16)
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(stacked16, mesh, CFG)
    probs = spmd.sp_tp_forward(jnp.asarray(images), params, CFG, mesh,
                               compute_dtype=jnp.bfloat16)
    assert np.abs(np.asarray(probs) - ref).max() < 1e-2


def test_sp_tp_forward_int8(setup):
    """SP x TP composes with int8 weight-only quantization (the TP layout
    shards {q, scale} together)."""
    stacked, images, ref = setup
    from vit_with_opencl_tpu.models import quant

    host = jax.tree.map(lambda a: np.asarray(a, np.float32), stacked)
    qparams = quant.quantize_stacked_params(host, CFG)
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_tp(qparams, mesh, CFG)
    probs = spmd.sp_tp_forward(jnp.asarray(images), params, CFG, mesh,
                               compute_dtype=jnp.float32)
    assert np.abs(np.asarray(probs) - ref).max() < 1e-2


def test_ring_blockwise_32k_bounded_memory():
    """Long-context dryrun (round-2 verdict item 8): T=32k ring attention
    over the blockwise Pallas local step on the 8-device virtual mesh.
    Per-device state is O(T_loc*hd) — nothing [T_loc, T_loc]-shaped reaches
    HBM — and the first rows must match the exact full softmax."""
    from jax.sharding import Mesh, PartitionSpec as P
    from vit_with_opencl_tpu.ops import ring_attention as ra

    T, hd, n = 32768, 8, 8
    mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("model",))
    q = jax.random.normal(jax.random.key(0), (1, 1, T, hd), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (1, 1, T, hd), jnp.float32) * 0.05
    v = jax.random.normal(jax.random.key(2), (1, 1, T, hd), jnp.float32)
    spec = P(None, None, "model", None)

    def fn(q, k, v):
        return ra.ring_attention_shard(
            q, k, v, axis_name="model", scale=0.125, seq_len=T,
            shard_tokens=T // n, impl="blockwise",
        )

    f = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                              out_specs=spec, check_vma=False))
    out = np.asarray(f(q, k, v))
    assert out.shape == (1, 1, T, hd)
    assert np.isfinite(out).all()
    qh, kh, vh = (np.asarray(a)[0, 0] for a in (q, k, v))
    s = (qh[:2] @ kh.T) * 0.125
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    np.testing.assert_allclose(out[0, 0, :2], p @ vh, atol=1e-5)


def test_vit_g_geometry_adamw_optimizer_state_sharded():
    """ViT-G training story (round-3 verdict item 4a): an AdamW train step at
    true ViT-G width (D=1664, hd=104, MLP=8192) on the virtual mesh, with the
    optimizer moments ACTUALLY sharded over "model" — fp32 mu+nu for the real
    1.84B model (~15 GB) exceed one chip's HBM, so GSPMD must spread them."""
    gcfg = ViTConfig(
        name="vit_g_geom",
        img_size=28,
        patch_size=14,
        embed_dim=1664,
        depth=2,
        num_heads=16,
        mlp_ratio=8192 / 1664,
        num_classes=16,
    )
    assert gcfg.head_dim == 104
    mesh = spmd.make_mesh(data=2, model=4)
    params = spmd.shard_params_gspmd(
        vit.random_stacked_params(gcfg, jax.random.key(0), jnp.float32),
        mesh, gcfg)
    init_fn, step = spmd.make_train_step(
        gcfg, mesh, lr=1e-4, optimizer="adamw", compute_dtype=jnp.float32)
    opt_state = init_fn(params)

    # optax.adamw = chain(scale_by_adam, add_decayed_weights, scale):
    # state[0] is ScaleByAdamState(count, mu, nu).
    adam = opt_state[0]
    for moment in (adam.mu, adam.nu):
        for name in ("qkv_w", "fc1_w", "fc2_w", "out_w"):
            leaf = moment["layers"][name]
            arrs = jax.tree.leaves(leaf)
            assert arrs, name
            for arr in arrs:
                spec = arr.sharding.spec
                assert "model" in jax.tree.leaves(tuple(spec)), (
                    f"adam moment for {name} is replicated "
                    f"(spec={spec}) — optimizer memory would not scale")
                # Sharded = each device holds 1/4 of the leaf.
                assert (arr.addressable_shards[0].data.size
                        == arr.size // 4), name

    images = jnp.asarray(fixtures.random_images(gcfg, n=8, seed=1))
    labels = jnp.arange(8) % gcfg.num_classes
    params2, opt_state2, loss = step(params, opt_state, images, labels)
    assert np.isfinite(float(loss))
    # Moments keep their sharding through the step (no silent gather).
    mu2 = opt_state2[0].mu["layers"]["qkv_w"]
    for arr in jax.tree.leaves(mu2):
        assert "model" in jax.tree.leaves(tuple(arr.sharding.spec))
