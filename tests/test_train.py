"""Training pipeline: data loader, prefetcher, Trainer loop, resume.

The reference has no training at all — this covers the framework-added
loop end-to-end on the 8-device virtual mesh: host batching → sharded
prefetch → GSPMD step → checkpoint/resume.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu import data as data_mod
from vit_with_opencl_tpu.harness import fixtures
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.parallel import spmd
from vit_with_opencl_tpu.train import Trainer

CFG = ViTConfig(
    name="train_small",
    img_size=32,
    patch_size=8,
    embed_dim=64,
    depth=2,
    num_heads=4,
    num_classes=17,
)


def _dataset(n=16, seed=5):
    images = fixtures.random_images(CFG, n=n, seed=seed)
    labels = (np.arange(n) * 7) % CFG.num_classes
    return images, labels


# -- memory_dataset --------------------------------------------------------


def test_memory_dataset_epochs_and_shuffle():
    images, labels = _dataset(10)
    batches = list(data_mod.memory_dataset(
        images, labels, 4, epochs=2, seed=3))
    # drop_last: 10 // 4 = 2 batches per epoch, 2 epochs.
    assert len(batches) == 4
    assert all(b[0].shape == (4, 3, 32, 32) for b in batches)
    # Deterministic: same seed reproduces the same order.
    again = list(data_mod.memory_dataset(images, labels, 4, epochs=2, seed=3))
    for (a, _), (b, _) in zip(batches, again):
        np.testing.assert_array_equal(a, b)
    # Different epochs shuffle differently.
    assert not np.array_equal(batches[0][0], batches[2][0])


def test_memory_dataset_no_labels_no_drop():
    images, _ = _dataset(10)
    batches = list(data_mod.memory_dataset(
        images, None, 4, epochs=1, shuffle=False, drop_last=False))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    assert all(b[1] is None for b in batches)
    np.testing.assert_array_equal(batches[0][0], images[:4])


def test_memory_dataset_validation():
    images, labels = _dataset(8)
    with pytest.raises(ValueError, match="length mismatch"):
        next(data_mod.memory_dataset(images, labels[:4], 2))
    with pytest.raises(ValueError, match="batch_size"):
        next(data_mod.memory_dataset(images, labels, 9))


# -- DevicePrefetcher ------------------------------------------------------


def test_prefetcher_yields_device_batches():
    images, labels = _dataset(8)
    src = data_mod.memory_dataset(images, labels, 4, epochs=1, shuffle=False)
    out = list(data_mod.DevicePrefetcher(src, buffer_size=2))
    assert len(out) == 2
    for imgs, labs in out:
        assert isinstance(imgs, jax.Array) and isinstance(labs, jax.Array)
    np.testing.assert_array_equal(np.asarray(out[0][0]), images[:4])


def test_prefetcher_sharded_over_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = spmd.make_mesh(data=8, model=1)
    images, labels = _dataset(16)
    src = data_mod.memory_dataset(images, labels, 16, epochs=1, shuffle=False)
    (imgs, labs), = list(data_mod.DevicePrefetcher(
        src, sharding=NamedSharding(mesh, P("data"))))
    assert len(imgs.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(imgs), images)


def test_prefetcher_propagates_source_errors():
    def bad():
        yield _dataset(4)[0][:2], np.zeros(2, np.int64)
        raise RuntimeError("disk on fire")

    it = data_mod.DevicePrefetcher(bad(), buffer_size=1)
    next(it)
    with pytest.raises(RuntimeError, match="disk on fire"):
        next(it)


# -- init_params -----------------------------------------------------------


def test_init_params_matches_stacked_tree():
    p_init = vit.init_params(CFG, seed=1)
    p_cheap = jax.tree.map(np.asarray, vit.cheap_stacked_params(CFG))
    assert jax.tree.structure(p_init) == jax.tree.structure(p_cheap)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.shape(a), np.shape(b)), p_init, p_cheap)
    # Forward runs and is finite from the init.
    probs = vit.forward(fixtures.random_images(CFG, n=2),
                        jax.device_put(p_init), CFG,
                        compute_dtype=jnp.float32)
    assert np.all(np.isfinite(np.asarray(probs)))


# -- Trainer ---------------------------------------------------------------


def test_trainer_descends_and_checkpoints(tmp_path):
    images, labels = _dataset(16)
    logs = []
    tr = Trainer(CFG, lr=1e-2, optimizer="adamw", compute_dtype=jnp.float32,
                 checkpoint_dir=str(tmp_path), checkpoint_every=4,
                 log_every=2, log_fn=logs.append, seed=7)
    tr.fit(data_mod.memory_dataset(images, labels, 8, epochs=None, seed=2),
           steps=8)
    assert tr.step_idx == 8
    assert logs and "loss" in logs[0]
    first = float(logs[0].split("loss ")[1].split(",")[0])
    last = float(logs[-1].split("loss ")[1].split(",")[0])
    assert last < first  # memorizing 16 images: loss must fall
    assert tr.latest_checkpoint().endswith("step_00000008")

    # Resume restores step counter, params, and optimizer state.
    tr2 = Trainer(CFG, lr=1e-2, optimizer="adamw",
                  compute_dtype=jnp.float32, checkpoint_dir=str(tmp_path),
                  log_every=0, seed=0)
    assert tr2.resume()
    assert tr2.step_idx == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        tr2.params, tr.params)
    tr2.fit(data_mod.memory_dataset(images, labels, 8, epochs=None, seed=9),
            steps=10)
    assert tr2.step_idx == 10
    assert tr2.last_loss < first


def test_trained_model_exports_to_reference_format(tmp_path):
    """Full production loop: train from scratch (cosine schedule) → export
    as a reference-format weight directory → reload through the reference
    loader → the golden oracle reproduces the trained model's outputs."""
    from vit_with_opencl_tpu.io import binfmt
    from vit_with_opencl_tpu.models import golden

    images, labels = _dataset(8)
    tr = Trainer(CFG, lr=1e-2, optimizer="adamw", schedule="cosine",
                 warmup_steps=2, total_steps=6, compute_dtype=jnp.float32,
                 log_every=0)
    tr.fit(data_mod.memory_dataset(images, labels, 8, epochs=None, seed=1),
           steps=6)
    files = tr.export_reference(str(tmp_path / "Network"))
    assert len(files) == len(binfmt.weight_names(CFG))

    loaded = binfmt.load_weights(tmp_path / "Network", CFG,
                                 round_to_6dp=False, strict=True)
    named = binfmt.weights_to_dict(loaded, CFG)
    ref_probs = golden.golden_forward(images[:4], named, CFG)
    host_params = jax.tree.map(np.asarray, tr.params)
    train_probs = np.asarray(vit.forward(
        images[:4], jax.device_put(host_params), CFG,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(ref_probs, train_probs, atol=2e-5)


def test_unstack_params_roundtrip():
    """unstack_params is the exact inverse of stack_params."""
    named = fixtures.random_params(CFG, seed=11, scale=0.05)
    stacked = vit.stack_params(named, CFG, param_dtype=jnp.float32)
    back = vit.unstack_params(stacked, CFG)
    from vit_with_opencl_tpu.io import binfmt

    for name in binfmt.weight_names(CFG):
        np.testing.assert_array_equal(
            back[name], np.asarray(named[name], np.float32).reshape(
                binfmt.weight_shapes(CFG)[name]), err_msg=name)


def test_trainer_sgd_grad_accum(tmp_path):
    images, labels = _dataset(16)
    tr = Trainer(CFG, lr=1e-2, optimizer="sgd", compute_dtype=jnp.float32,
                 grad_accum=2, log_every=0)
    tr.fit(data_mod.memory_dataset(images, labels, 16, epochs=4, seed=2))
    assert tr.step_idx == 4
    assert np.isfinite(tr.last_loss)
    with pytest.raises(ValueError, match="without checkpoint_dir"):
        tr.save()


def test_trainer_ema_tracks_params(tmp_path):
    """EMA shadow weights lag the live params toward them (timm-style eval
    weights); they checkpoint/resume and export via use_ema=True."""
    images, labels = _dataset(16)
    tr = Trainer(CFG, lr=5e-2, optimizer="sgd", compute_dtype=jnp.float32,
                 ema_decay=0.5, log_every=0,
                 checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)
    init = jax.tree.map(np.asarray, tr.ema_params)
    tr.fit(data_mod.memory_dataset(images, labels, 16, epochs=4, seed=3))
    ema = jax.tree.map(np.asarray, tr.ema_params)
    live = jax.tree.map(np.asarray, tr.params)
    # EMA moved off the init and sits strictly between init and live for
    # at least the big matrices.
    q0, qe, ql = (t["layers"]["qkv_w"] for t in (init, ema, live))
    assert np.abs(qe - q0).max() > 0
    assert np.abs(qe - ql).max() > 0  # lags, not equal
    d_e, d_l = np.abs(qe - q0).mean(), np.abs(ql - q0).mean()
    assert d_e < d_l  # shadow trails the live weights

    # resume restores the shadow
    tr2 = Trainer(CFG, lr=5e-2, optimizer="sgd",
                  compute_dtype=jnp.float32, ema_decay=0.5, log_every=0,
                  checkpoint_dir=str(tmp_path / "ck"))
    assert tr2.resume()
    np.testing.assert_allclose(
        np.asarray(tr2.ema_params["layers"]["qkv_w"]),
        np.asarray(tr.ema_params["layers"]["qkv_w"]), atol=0)

    out = tr.export_reference(str(tmp_path / "W"), use_ema=True)
    assert out  # directory written
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(CFG, optimizer="sgd", log_every=0,
                compute_dtype=jnp.float32).export_reference(
            str(tmp_path / "W2"), use_ema=True)


def test_resume_across_ema_setting_change(tmp_path):
    """Turning EMA on (or off) across restarts must not crash resume():
    Orbax restores are structure-strict in both directions, so resume
    retries with the other checkpoint shape."""
    images, labels = _dataset(16)
    ck = str(tmp_path / "ck")
    # checkpoint WITHOUT ema...
    tr = Trainer(CFG, lr=1e-2, optimizer="sgd", compute_dtype=jnp.float32,
                 log_every=0, checkpoint_dir=ck, checkpoint_every=2)
    tr.fit(data_mod.memory_dataset(images, labels, 16, epochs=2, seed=4))
    # ...resume WITH ema: shadow seeded from the restored params
    tr_ema = Trainer(CFG, lr=1e-2, optimizer="sgd",
                     compute_dtype=jnp.float32, ema_decay=0.9,
                     log_every=0, checkpoint_dir=ck, checkpoint_every=2)
    assert tr_ema.resume()
    np.testing.assert_allclose(
        np.asarray(tr_ema.ema_params["layers"]["qkv_w"]),
        np.asarray(tr_ema.params["layers"]["qkv_w"]), atol=0)
    # ...continue training and checkpoint WITH ema, then resume WITHOUT
    tr_ema.fit(data_mod.memory_dataset(images, labels, 16, epochs=2,
                                       seed=5))
    tr_plain = Trainer(CFG, lr=1e-2, optimizer="sgd",
                       compute_dtype=jnp.float32, log_every=0,
                       checkpoint_dir=ck)
    assert tr_plain.resume()
    assert tr_plain.ema_params is None
    assert tr_plain.step_idx == tr_ema.step_idx


def test_label_smoothing_loss_semantics():
    """Smoothed loss = (1-eps)*CE + eps*uniform-CE: larger than plain CE
    for a confident-correct model, equal at eps=0; invalid eps rejected."""
    mesh = spmd.make_mesh(data=1, model=1)
    params = vit.random_stacked_params(CFG, jax.random.key(1), jnp.float32)
    images, labels = _dataset(8)
    images, labels = jnp.asarray(images), jnp.asarray(labels)

    def loss_of(**kw):
        step = spmd.make_train_step(CFG, mesh, lr=0.0, optimizer="sgd",
                                    compute_dtype=jnp.float32, **kw)
        _, loss = step(params, images, labels)
        return float(loss)

    plain = loss_of()
    zero = loss_of(label_smoothing=0.0)
    smooth = loss_of(label_smoothing=0.1)
    assert plain == zero
    # random logits: uniform-CE ~ log(C) vs CE's label term — both finite,
    # and the blend must differ from the plain loss.
    assert np.isfinite(smooth) and abs(smooth - plain) > 1e-6
    with pytest.raises(ValueError, match="label_smoothing"):
        spmd.make_train_step(CFG, mesh, label_smoothing=1.0)


def test_grad_clip_norm_bounds_update():
    """grad_clip_norm clips by global L2 norm: with a tiny max norm the SGD
    update magnitude is bounded by lr*max_norm; loss still descends over
    steps; clipped and unclipped steps agree when the norm is huge."""
    mesh = spmd.make_mesh(data=1, model=1)
    params = vit.random_stacked_params(CFG, jax.random.key(0), jnp.float32)
    images, labels = _dataset(8)
    images = jnp.asarray(images)
    labels = jnp.asarray(labels)

    step_clip = spmd.make_train_step(CFG, mesh, lr=1.0, optimizer="sgd",
                                     compute_dtype=jnp.float32,
                                     grad_clip_norm=1e-3)
    p1, loss1 = step_clip(params, images, labels)
    # total parameter movement <= lr * max_norm (global L2)
    delta = jnp.sqrt(sum(
        jnp.sum(jnp.square(a - b))
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params))
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)))
    assert float(delta) <= 1e-3 * 1.0 + 1e-6

    # A huge max norm is a no-op: matches the unclipped step exactly.
    step_loose = spmd.make_train_step(CFG, mesh, lr=1e-2, optimizer="sgd",
                                      compute_dtype=jnp.float32,
                                      grad_clip_norm=1e9)
    step_plain = spmd.make_train_step(CFG, mesh, lr=1e-2, optimizer="sgd",
                                      compute_dtype=jnp.float32)
    pa, _ = step_loose(params, images, labels)
    pb, _ = step_plain(params, images, labels)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    # invalid values rejected (0 freezes training, negative flips signs)
    for bad in (0.0, -1.0):
        with pytest.raises(ValueError, match="grad_clip_norm"):
            spmd.make_train_step(CFG, mesh, grad_clip_norm=bad)

    # adamw path: clip chains into optax and the loss descends.
    init_fn, step8 = spmd.make_train_step(CFG, mesh, lr=1e-3,
                                          optimizer="adamw",
                                          compute_dtype=jnp.float32,
                                          grad_clip_norm=1.0)
    state = init_fn(params)
    p, s = params, state
    losses = []
    for _ in range(3):
        p, s, loss = step8(p, s, images, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_resume_across_grad_clip_setting_change(tmp_path):
    """Toggling grad_clip_norm wraps adamw in optax.chain, changing the
    opt_state pytree structure (ADVICE r3): resume must fall back to a
    fresh optimizer state with a warning instead of crashing, and params/
    step must still restore."""
    images, labels = _dataset(16)
    ck = str(tmp_path / "ck")
    tr = Trainer(CFG, lr=1e-2, optimizer="adamw", compute_dtype=jnp.float32,
                 log_every=0, checkpoint_dir=ck, checkpoint_every=2)
    tr.fit(data_mod.memory_dataset(images, labels, 16, epochs=2, seed=4))
    assert tr.step_idx == 2

    logs = []
    tr_clip = Trainer(CFG, lr=1e-2, optimizer="adamw",
                      compute_dtype=jnp.float32, grad_clip_norm=1.0,
                      log_every=0, log_fn=logs.append, checkpoint_dir=ck)
    assert tr_clip.resume()
    assert tr_clip.step_idx == 2
    assert any("opt_state" in m for m in logs)  # warned about the restart
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        tr_clip.params, tr.params)
    assert tr_clip.opt_state is not None  # fresh, usable state
    tr_clip.fit(data_mod.memory_dataset(images, labels, 16, epochs=2,
                                        seed=5))
    assert tr_clip.step_idx == 4 and np.isfinite(tr_clip.last_loss)

    # The reverse direction (clip -> no clip) also resumes.
    tr_clip.save()
    tr_back = Trainer(CFG, lr=1e-2, optimizer="adamw",
                      compute_dtype=jnp.float32, log_every=0,
                      checkpoint_dir=ck)
    assert tr_back.resume()
    assert tr_back.step_idx == 4

    # An sgd (stateless) trainer can read an adamw checkpoint's params.
    tr_sgd = Trainer(CFG, lr=1e-2, optimizer="sgd",
                     compute_dtype=jnp.float32, log_every=0,
                     checkpoint_dir=ck)
    assert tr_sgd.resume()
    assert tr_sgd.step_idx == 4 and tr_sgd.opt_state is None


def test_ema_shadow_stays_fp32():
    """The EMA shadow is fp32 regardless of param dtype (a bf16 shadow with
    decay ~0.9999 has per-step increments below bf16 ulp and silently
    freezes — ADVICE r3); matching timm's ModelEmaV2."""
    images, labels = _dataset(16)
    tr = Trainer(CFG, lr=5e-2, optimizer="sgd", compute_dtype=jnp.float32,
                 ema_decay=0.9999, log_every=0)
    floats = [l for l in jax.tree.leaves(tr.ema_params)
              if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    assert floats and all(
        jnp.asarray(l).dtype == jnp.float32 for l in floats)
    # head_w gets gradients from step 1 (encoder weights don't: the
    # zero-init head blocks backprop on the very first step).
    before = np.asarray(tr.ema_params["head_w"]).copy()
    tr.fit(data_mod.memory_dataset(images, labels, 16, epochs=2, seed=6))
    after = np.asarray(tr.ema_params["head_w"])
    assert after.dtype == np.float32
    # Steps at decay 0.9999 still move the fp32 shadow (the bf16-ulp
    # freeze this guards against would leave it bit-identical).
    assert np.abs(after - before).max() > 0


def test_trainer_device_augment_pipeline():
    """Trainer(device_augment=...) — the full on-chip DeiT input pipeline:
    the loader ships RAW uint8 HWC batches (augment_device.raw_batches) and
    RRC+flip+RandAugment+normalize(+Mixup) fuse into the step's program.
    Runs on the 8-device mesh (the uint8 batch shards over "data")."""
    from vit_with_opencl_tpu import augment_device

    rng = np.random.default_rng(9)
    n, src = 32, 40
    raw = rng.integers(0, 256, (n, src, src, 3), dtype=np.uint8)
    labels = (np.arange(n) * 3) % CFG.num_classes

    # augment only (int labels reach the step), then augment + mixup.
    for mix in (None, {"prob": 1.0}):
        tr = Trainer(CFG, lr=5e-2, optimizer="sgd",
                     compute_dtype=jnp.float32,
                     device_augment={"randaugment": (2, 9.0)},
                     mixup=mix, log_every=0, seed=6)
        losses = []
        for _ in range(3):
            tr.fit(augment_device.raw_batches(raw, labels, 16, epochs=1,
                                              seed=7))
            losses.append(tr.last_loss)
        assert np.isfinite(losses).all(), (mix, losses)
        assert losses[-1] < losses[0], (mix, losses)

    # AdamW variant exercises the opt-state prep wrapper.
    tra = Trainer(CFG, lr=1e-3, optimizer="adamw",
                  compute_dtype=jnp.float32,
                  device_augment={}, mixup={"prob": 0.5}, log_every=0,
                  seed=8)
    tra.fit(augment_device.raw_batches(raw, labels, 16, epochs=1, seed=1))
    assert np.isfinite(tra.last_loss)


def test_trainer_split_step_mode():
    """attention_impl='split:<backward>[:G]' routes the Trainer through the
    program-split host-loop step (parallel/split_step) — the path that
    trains ViT-G on one chip. SGD-only, single-device, loss descends, and
    device-side mixup composes via the separate prep jit."""
    images, labels = _dataset(16)
    mesh1 = spmd.make_mesh(data=1, model=1)
    tr = Trainer(CFG, mesh=mesh1, lr=5e-2, optimizer="sgd",
                 compute_dtype=jnp.float32,
                 attention_impl="split:fused_staged", log_every=0, seed=3)
    losses = []
    for _ in range(4):
        tr.fit(data_mod.memory_dataset(images, labels, 16, epochs=1,
                                       seed=2))
        losses.append(tr.last_loss)
    assert losses[-1] < losses[0], losses

    # Mixup composes (separate prep jit, int labels in).
    trm = Trainer(CFG, mesh=mesh1, lr=1e-2, optimizer="sgd",
                  compute_dtype=jnp.float32, attention_impl="split:flash:2",
                  mixup={"prob": 1.0}, log_every=0, seed=4)
    trm.fit(data_mod.memory_dataset(images, labels, 16, epochs=1, seed=5))
    assert np.isfinite(trm.last_loss)

    with pytest.raises(ValueError, match="stateless SGD"):
        Trainer(CFG, mesh=mesh1, optimizer="adamw",
                attention_impl="split:flash")
    with pytest.raises(ValueError, match="single-device"):
        Trainer(CFG, optimizer="sgd", attention_impl="split:flash")


def test_trainer_consumes_tuning_cache(tmp_path):
    """Trainer(batch_size=...) looks up the autotune cache's quant='train'
    entry (the inference engine's startup lookup, mirrored for training)
    and the tuned launch knobs must not change the step's math — same data,
    same seed, same losses as the untuned Trainer."""
    from vit_with_opencl_tpu.perf import autotune

    path = str(tmp_path / "tuning.json")
    per_dev = 8 // len(jax.devices()) or 1
    autotune.save_tuning(
        path, autotune.tuning_key(CFG, per_dev, jnp.float32, "train"),
        {"attention_ipc": 2, "attention_bwd_ipc": 2,
         "device": str(jax.devices()[0])})
    images, labels = _dataset(16)

    losses = {}
    for name, kw in (("tuned", dict(batch_size=8, tuning_path=path)),
                     ("default", {})):
        tr = Trainer(CFG, lr=1e-2, optimizer="sgd",
                     compute_dtype=jnp.float32, attention_impl="flash",
                     log_every=0, seed=3, **kw)
        if name == "tuned":
            assert tr.tuning.get("attention_bwd_ipc") == 2
        else:
            assert tr.tuning == {}
        tr.fit(data_mod.memory_dataset(images, labels, 8, epochs=None,
                                       seed=4), steps=3)
        losses[name] = tr.last_loss
    np.testing.assert_allclose(losses["tuned"], losses["default"],
                               rtol=1e-5)
