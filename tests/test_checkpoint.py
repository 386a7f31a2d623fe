"""Checkpoint format tests: optimizer state, stripping, fp16 promotion,
metadata-driven model reconstruction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chessvision_tpu import models
from chessvision_tpu.checkpoint import (
    load_checkpoint,
    load_opt_state_leaves,
    promote_checkpoint,
    save_checkpoint,
    strip_checkpoint,
)


@pytest.fixture
def small_state(tmp_path):
    import optax

    model = models.YoloCls(width=8, dtype=jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))))
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])
    return model, variables, opt_state, tmp_path


def test_optimizer_state_roundtrip_and_strip(small_state) -> None:
    model, variables, opt_state, tmp_path = small_state
    path = tmp_path / "ck.npz"
    save_checkpoint(path, variables, {"epoch": 1}, opt_state=opt_state)

    loaded, meta = load_checkpoint(path)
    leaves = load_opt_state_leaves(loaded)
    want = jax.tree.leaves(opt_state)
    assert leaves is not None and len(leaves) == len(want)
    for a, b in zip(leaves, want):
        np.testing.assert_array_equal(a, np.asarray(b))

    stripped = strip_checkpoint(path, tmp_path / "stripped.npz")
    loaded2, meta2 = load_checkpoint(stripped)
    assert load_opt_state_leaves(loaded2) is None
    assert meta2 == meta
    assert stripped.stat().st_size < path.stat().st_size


def test_promote_fp16_roundtrip(small_state) -> None:
    model, variables, opt_state, tmp_path = small_state
    src = tmp_path / "train.npz"
    save_checkpoint(src, variables, {"best_val_score": 0.9}, opt_state=opt_state)
    dest = promote_checkpoint(src, tmp_path / "best.npz")
    assert dest.stat().st_size < src.stat().st_size
    loaded, meta = load_checkpoint(dest)
    assert meta["best_val_score"] == 0.9
    assert load_opt_state_leaves(loaded) is None
    # params load back as float32 and are close to the originals
    for a, b in zip(jax.tree.leaves(loaded["params"]), jax.tree.leaves(variables["params"])):
        assert np.asarray(a).dtype == np.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
    # and the model runs with them
    y = model.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        jnp.zeros((1, 64, 64, 1)),
    )
    assert y.shape == (1, 13)


def test_ema_checkpoint_keeps_raw_params_and_promotes_ema(small_state) -> None:
    """EMA-enabled checkpoints store the raw trajectory under 'params'
    (consistent with opt_state for resume) and the EMA view under
    'ema_params'; promotion ships the EMA view as 'params'."""
    model, variables, opt_state, tmp_path = small_state
    ema = jax.tree.map(lambda x: np.asarray(x) + 1.0, variables["params"])
    src = tmp_path / "train_ema.npz"
    save_checkpoint(
        src,
        {**variables, "ema_params": ema},
        {"epoch": 3},
        opt_state=opt_state,
    )

    loaded, _ = load_checkpoint(src)
    # raw params and opt_state both present — a consistent resume pair
    for a, b in zip(jax.tree.leaves(loaded["params"]), jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_opt_state_leaves(loaded) is not None
    for a, b in zip(jax.tree.leaves(loaded["ema_params"]), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dest = promote_checkpoint(src, tmp_path / "best_ema.npz", compress=False)
    promoted, _ = load_checkpoint(dest)
    assert "ema_params" not in promoted
    assert load_opt_state_leaves(promoted) is None
    for a, b in zip(jax.tree.leaves(promoted["params"]), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metadata_driven_model_reconstruction(tmp_path, monkeypatch) -> None:
    """A checkpoint trained with non-default architecture kwargs loads
    into the correctly-sized module via training_config metadata."""
    from chessvision_tpu import ChessVision

    model = models.UNet(base=16, dtype=jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    path = tmp_path / "ext.npz"
    save_checkpoint(path, variables, {"training_config": {"model_id": "unet", "base": 16, "bilinear": False}})

    cv = ChessVision(board_extractor_weights=str(path), dtype=jnp.float32)
    module, spec, loaded = cv.board_extractor
    assert module.base == 16
    y = module.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        jnp.zeros((1, 64, 64, 3)),
    )
    assert y.shape == (1, 64, 64, 1)


def test_load_metadata_only(small_state) -> None:
    """load_metadata returns the metadata dict without the weights (and {}
    when a checkpoint predates metadata) — the trainers use it to adopt a
    resumed checkpoint's architecture (base/width/model_id) so a
    mismatched CLI default cannot crash init with a shape error."""
    from chessvision_tpu.checkpoint import load_metadata

    model, variables, opt_state, tmp_path = small_state
    path = tmp_path / "ck.npz"
    save_checkpoint(
        path, variables, {"epoch": 3, "training_config": {"model_id": "yolo", "width": 8}}
    )
    meta = load_metadata(path)
    assert meta["epoch"] == 3
    assert meta["training_config"] == {"model_id": "yolo", "width": 8}

    bare = tmp_path / "bare.npz"
    np.savez(bare, **{"params/w": np.zeros(2, np.float32)})
    assert load_metadata(bare) == {}
