"""The UNet trainer's geometry guard (anti-overfit protocol).

Round-4 measured failure mode: a synthetic fine-tune reached a val-dice
RECORD (0.9878) while test wrong squares regressed 46 → 71, because dice
is blind to small mask-edge bleed that shifts the extracted quadrangle.
The guard tracks quadrangle corner error on the real val boards and
vetoes checkpoints that regress it (train_unet.guard_verdict + the
run_guard closure in train_model).  Reference analogue: none — the 3LC
loop's stop signal is a human inspecting the dashboard
(reference scripts/train/train_unet.py:186-196).
"""

from __future__ import annotations

import numpy as np
import pytest

from chessvision_tpu.train.train_unet import guard_verdict


def test_guard_verdict_pass_and_veto() -> None:
    base = {"err": 1.0, "lost": 0}
    # within tolerance, no boards lost → pass
    assert guard_verdict({"err": 1.5, "lost": 0}, base, tolerance=0.75)
    # corner error regressed past tolerance → veto
    assert not guard_verdict({"err": 2.0, "lost": 0}, base, tolerance=0.75)
    # a newly-lost board is always a veto, even with perfect corners
    assert not guard_verdict({"err": 0.1, "lost": 1}, base, tolerance=0.75)
    # improvement on both axes → pass
    assert guard_verdict({"err": 0.2, "lost": 0}, base, tolerance=0.0)


def test_guard_verdict_fresh_run_never_blocks() -> None:
    """A from-scratch run has an unusable baseline (inf err, all boards
    lost) — the guard must not veto anything there; it is a FINE-TUNE
    protocol."""
    base = {"err": float("inf"), "lost": 8}
    assert guard_verdict({"err": 3.0, "lost": 8}, base, tolerance=0.75)
    assert guard_verdict({"err": float("inf"), "lost": 8}, base, tolerance=0.75)


@pytest.mark.slow
def test_trainer_guard_integration(tmp_path, monkeypatch) -> None:
    """train_model with guard_quad=True computes a baseline, logs guard
    metrics, and still checkpoints on synthetic data (fresh-run baseline
    never vetoes)."""
    import jax.numpy as jnp

    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))
    from chessvision_tpu.train import data as data_lib
    from chessvision_tpu.train import train_unet
    from tests.distributed_worker import synthetic_seg_data

    monkeypatch.setattr(
        data_lib, "load_board_extraction", lambda *a, **k: synthetic_seg_data()
    )
    run, ck = train_unet.train_model(
        epochs=2,
        batch_size=8,
        base=4,
        model_dtype=jnp.float32,
        collection_frequency=99,
        patience=99,
        validations_per_epoch=2,
        augment=False,
        use_mesh=False,
        seed=7,
        guard_quad=True,
    )
    from pathlib import Path

    assert Path(ck).exists()
    # run parameters carry the best score; guard metrics were logged when a
    # record epoch occurred (epochs=1 → exactly one validation)
    assert np.isfinite(run.parameters["best_val_score"])
