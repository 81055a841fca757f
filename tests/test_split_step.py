"""Program-split training step (parallel/split_step): exact parity with the
monolithic fused-VJP step, group-size invariance, loss descent.

The split step exists to train ViT-L/H through the fused backward on
compile-limited targets (the relay crashes on the monolithic 24–32-layer
fused-VJP program, VERDICT r3 item 5); its math must be IDENTICAL to
spmd.make_train_step(attention_impl="fused")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_with_opencl_tpu import ViTConfig
from vit_with_opencl_tpu.models import vit
from vit_with_opencl_tpu.parallel import split_step, spmd

CFG = ViTConfig(
    name="split_small",
    img_size=32,
    patch_size=8,
    embed_dim=64,
    depth=4,
    num_heads=4,
    num_classes=13,
)


@pytest.fixture(scope="module")
def setup():
    params = vit.random_stacked_params(CFG, jax.random.key(0), jnp.float32)
    images = jax.random.normal(
        jax.random.key(1), (4, CFG.in_chans, CFG.img_size, CFG.img_size))
    labels = jnp.arange(4) % CFG.num_classes
    return params, images, labels


def _mono_step(params, images, labels, **kw):
    mesh = spmd.make_mesh(data=1, model=1)
    step = spmd.make_train_step(
        CFG, mesh, lr=1e-2, compute_dtype=jnp.float32,
        attention_impl="fused", **kw)
    return step(params, images, labels)


def test_split_step_matches_monolithic(setup):
    params, images, labels = setup
    p_ref, loss_ref = _mono_step(params, images, labels)
    step = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=1)
    p_new, loss = step(params, images, labels)
    assert abs(float(loss) - float(loss_ref)) < 1e-6
    for k, ref_leaf, new_leaf in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(
            np.asarray(new_leaf, np.float32), np.asarray(ref_leaf, np.float32),
            atol=2e-5, rtol=2e-5, err_msg=str(k[0]))


def test_split_step_group_size_invariant(setup):
    params, images, labels = setup
    step1 = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=1)
    step2 = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=2)
    p1, l1 = step1(params, images, labels)
    p2, l2 = step2(params, images, labels)
    assert abs(float(l1) - float(l2)) < 1e-6
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_split_step_descends(setup):
    params, images, labels = setup
    step = split_step.make_split_train_step(
        CFG, lr=5e-2, compute_dtype=jnp.float32, layers_per_program=2)
    losses = []
    p = params
    for _ in range(5):
        p, loss = step(p, images, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_split_step_grad_clip_and_soft_labels(setup):
    params, images, labels = setup
    soft = jax.nn.one_hot(labels, CFG.num_classes) * 0.9 + 0.1 / CFG.num_classes
    p_ref, loss_ref = _mono_step(params, images, soft, grad_clip_norm=0.5,
                                 label_smoothing=0.0)
    step = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=1,
        grad_clip_norm=0.5)
    p_new, loss = step(params, images, soft)
    assert abs(float(loss) - float(loss_ref)) < 1e-6
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_split_step_rejects_bad_group():
    with pytest.raises(ValueError, match="must divide depth"):
        split_step.make_split_train_step(CFG, layers_per_program=3)


def test_split_step_staged_backward_matches_fused(setup):
    """backward='fused_staged' (one jit per backward Pallas stage — the
    D>=1024 relay-compile dodge) must reproduce the fused split step
    exactly: same kernels, different program boundaries."""
    params, images, labels = setup
    ref_step = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=1)
    p_ref, loss_ref = ref_step(params, images, labels)
    step = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=1,
        backward="fused_staged")
    p_new, loss = step(params, images, labels)
    assert abs(float(loss) - float(loss_ref)) < 1e-7
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_split_step_flash_backward_matches_monolithic_flash(setup):
    """backward='flash' (per-op layer + flash-attention VJP per group) must
    match spmd.make_train_step(attention_impl='flash') — the route for
    widths the fused trainable kernel cannot hold (ViT-G: 76.7 MB/layer)."""
    params, images, labels = setup
    mesh = spmd.make_mesh(data=1, model=1)
    mono = spmd.make_train_step(
        CFG, mesh, lr=1e-2, compute_dtype=jnp.float32,
        attention_impl="flash")
    p_ref, loss_ref = mono(params, images, labels)
    step = split_step.make_split_train_step(
        CFG, lr=1e-2, compute_dtype=jnp.float32, layers_per_program=2,
        backward="flash")
    p_new, loss = step(params, images, labels)
    assert abs(float(loss) - float(loss_ref)) < 1e-6
    for k, ref_leaf, new_leaf in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(
            np.asarray(new_leaf, np.float32), np.asarray(ref_leaf, np.float32),
            atol=2e-5, rtol=2e-5, err_msg=str(k[0]))


def test_split_step_flash_bf16_params_descend(setup):
    """bf16 param masters (the ViT-G single-chip memory mode): the flash
    split step must run and descend with bf16 params end-to-end."""
    params, images, labels = setup
    p = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    step = split_step.make_split_train_step(
        CFG, lr=5e-2, compute_dtype=jnp.bfloat16, layers_per_program=2,
        backward="flash")
    losses = []
    for _ in range(5):
        p, loss = step(p, images, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert jax.tree.leaves(p)[0].dtype == jnp.bfloat16
