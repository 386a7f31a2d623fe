"""Dataset table registration tests (the reference's get_or_create_tables
layer) + sweep data collection/plot."""

from pathlib import Path

import numpy as np
import pytest

from chessvision_tpu import constants


@pytest.fixture(autouse=True)
def store_root(tmp_path, monkeypatch):
    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))


fixtures = pytest.mark.skipif(
    not (Path(constants.DATA_ROOT) / "board_extraction").exists(),
    reason="fixture datasets unavailable",
)


@fixtures
def test_get_or_create_board_extraction_tables() -> None:
    from chessvision_tpu.train.tables import get_or_create_board_extraction_tables

    t = get_or_create_board_extraction_tables()
    assert len(t["train"]) + len(t["val"]) == 631
    assert len(t["val"]) == 63
    # deterministic + reloadable
    t2 = get_or_create_board_extraction_tables()
    assert list(t2["val"]["example_id"]) == list(t["val"]["example_id"])
    assert t["train"].lineage["op"] == "select"


@fixtures
def test_get_or_create_classification_tables_and_weights() -> None:
    from chessvision_tpu.train.tables import (
        get_or_create_classification_tables,
        sample_weights_for_ids,
    )

    t = get_or_create_classification_tables()
    assert len(t["train"]) == 8931 and len(t["val"]) == 2134
    # uniform weights -> None
    ids = list(t["train"]["example_id"][:10])
    assert sample_weights_for_ids(t["train"], ids) is None
    # curated weights flow through
    w = np.ones(len(t["train"]))
    w[0] = 5.0
    t["train"].with_column("sample_weight", w)
    got = sample_weights_for_ids(t["train"], ids)
    assert got is not None and got[0] == 5.0 and got[1] == 1.0


def test_sweep_collect_and_plot(tmp_path) -> None:
    from chessvision_tpu.runstore import init
    from chessvision_tpu.train.sweep import collect_sweep_data, plot_sweep

    for i, (lr, score) in enumerate([(1e-5, 0.91), (3e-5, 0.95), (1e-4, 0.93)]):
        run = init("sweep-proj", f"s-{i}", parameters={
            "learning_rate": lr, "threshold": 0.5, "use_sample_weights": False,
            "best_val_score": score, "sweep_id": 7,
        })
    rows = collect_sweep_data("sweep-proj", sweep_id=7)
    assert len(rows) == 3
    assert {r["best_val_score"] for r in rows} == {0.91, 0.95, 0.93}
    out = plot_sweep("sweep-proj", 7, out_path=str(tmp_path / "sweep.png"))
    assert Path(out).stat().st_size > 1000
