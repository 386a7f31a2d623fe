"""Sharded training steps on the 8-device virtual CPU mesh.

Covers multi-device training directly (independently of the driver's
dryrun): one ``make_seg_train_step`` and one ``make_cls_train_step`` over
a ``Mesh``, with loss/metric parity vs the unsharded step on identical
inputs (the DP all-reduce that XLA inserts from the sharding annotations
must not change the math; reference loops train_unet.py:289-329,
train_classifier.py:63-111)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chessvision_tpu import models
from chessvision_tpu.parallel import create_mesh, data_sharding, replicate
from chessvision_tpu.train.steps import (
    TrainState,
    make_cls_train_step,
    make_optimizer,
    make_seg_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _seg_state() -> TrainState:
    unet, _ = models.create_extractor("unet", base=8)
    variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    tx = make_optimizer(
        "rmsprop", 1e-4, weight_decay=1e-8, momentum=0.999, gradient_clipping=1.0
    )
    return TrainState.create(
        apply_fn=unet.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


def _cls_state() -> TrainState:
    cls, _ = models.create_classifier("resnet18", width=8)
    variables = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32))
    return TrainState.create(
        apply_fn=cls.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer("adam", 1e-3),
    )


def test_seg_train_step_sharded_matches_unsharded() -> None:
    mesh = create_mesh(8)
    rng = np.random.default_rng(0)
    images = rng.random((16, 64, 64, 3), np.float32)
    masks = (rng.random((16, 64, 64)) > 0.5).astype(np.float32)

    state = _seg_state()
    plain_step = make_seg_train_step()
    state_p, metrics_p = plain_step(state, jnp.asarray(images), jnp.asarray(masks))

    state_s = jax.device_put(_seg_state(), replicate(mesh))
    imgs_s = jax.device_put(images, data_sharding(mesh, 4))
    masks_s = jax.device_put(masks, data_sharding(mesh, 3))
    sharded_step = make_seg_train_step(mesh)
    state_sh, metrics_s = sharded_step(state_s, imgs_s, masks_s)

    np.testing.assert_allclose(
        float(metrics_p["loss"]), float(metrics_s["loss"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(metrics_p["dice"]), float(metrics_s["dice"]), rtol=1e-3
    )
    # updated parameters agree (the all-reduced gradient is the full-batch one)
    flat_p = jax.tree.leaves(state_p.params)
    flat_s = jax.tree.leaves(state_sh.params)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # outputs really are sharded over the mesh
    assert len(state_sh.params["inc"]["conv1"]["kernel"].sharding.device_set) == 8


def test_cls_train_step_sharded_matches_unsharded() -> None:
    mesh = create_mesh(8)
    rng = np.random.default_rng(1)
    images = rng.random((32, 64, 64, 1), np.float32)
    labels = rng.integers(0, 13, (32,)).astype(np.int32)

    state = _cls_state()
    plain_step = make_cls_train_step()
    state_p, metrics_p = plain_step(state, jnp.asarray(images), jnp.asarray(labels))

    state_s = jax.device_put(_cls_state(), replicate(mesh))
    imgs_s = jax.device_put(images, data_sharding(mesh, 4))
    labels_s = jax.device_put(labels, data_sharding(mesh, 1))
    sharded_step = make_cls_train_step(mesh)
    state_sh, metrics_s = sharded_step(state_s, imgs_s, labels_s)

    np.testing.assert_allclose(
        float(metrics_p["loss"]), float(metrics_s["loss"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(metrics_p["accuracy"]), float(metrics_s["accuracy"]), rtol=1e-3
    )
    # Adam normalizes by sqrt(v): a last-bit bf16 gradient difference can
    # flip the sign of a near-zero normalized update, moving a weight by up
    # to ~2·lr (2e-3).  Loss/accuracy parity above is the strong check;
    # params must agree to the update scale.
    for a, b in zip(jax.tree.leaves(state_p.params), jax.tree.leaves(state_sh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)


def test_seg_train_step_sharded_multiple_steps() -> None:
    """Two consecutive sharded steps advance step count and change params
    (no silent no-op from a sharding mismatch)."""
    mesh = create_mesh(8)
    rng = np.random.default_rng(2)
    state = jax.device_put(_seg_state(), replicate(mesh))
    step = make_seg_train_step(mesh)
    before = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    for i in range(2):
        imgs = jax.device_put(rng.random((8, 64, 64, 3), np.float32), data_sharding(mesh, 4))
        msks = jax.device_put(
            (rng.random((8, 64, 64)) > 0.5).astype(np.float32), data_sharding(mesh, 3)
        )
        state, metrics = step(state, imgs, msks)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(before, after)


def test_cls_train_step_freeze_bn_keeps_stats_and_trains_params() -> None:
    """--freeze-bn fine-tune mode: BatchNorm running stats must not move,
    parameters must (the mode exists because stats drift under
    augmented/reweighted fine-tune batches regressed converged models)."""
    state = _cls_state()
    step = make_cls_train_step(None, freeze_bn=True)
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (16, 64, 64, 1))
    labs = jnp.arange(16) % 13
    new_state, metrics = step(state, imgs, labs)
    for old, new in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(new_state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params))
    )
    assert np.isfinite(float(metrics["loss"]))
