"""Ingestion pipeline tests: quality scores vs reference semantics and the
local-folder ingestion path with a stub engine."""

import numpy as np
import pytest

from chessvision_tpu.ingest import (
    mask_completeness,
    probability_confidence,
    probability_distribution,
    quadrangle_regularity,
)


def test_probability_distribution_bimodal_vs_uniform() -> None:
    bimodal = np.concatenate([np.zeros(5000), np.ones(5000)]).astype(np.float32)
    uniform = np.random.default_rng(0).random(10000).astype(np.float32)
    # perfect bimodal = 2 occupied bins -> 1 - log2(2)/log2(10) ≈ 0.699
    assert probability_distribution(bimodal) > 0.65
    assert probability_distribution(uniform) < 0.2
    assert probability_distribution(bimodal) > probability_distribution(uniform)


def test_mask_completeness_solid_vs_holey() -> None:
    solid = np.zeros((256, 256), np.float32)
    solid[50:200, 50:200] = 1.0
    assert mask_completeness(solid) > 0.99

    holey = solid.copy()
    holey[100:150, 100:150] = 0.0
    score = mask_completeness(holey)
    assert 0.5 < score < 0.95

    assert mask_completeness(np.zeros((256, 256), np.float32)) == 0.0


def test_quadrangle_regularity() -> None:
    square = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], np.float32)
    assert quadrangle_regularity(square) > 0.99
    skewed = np.array([[0, 0], [100, 0], [130, 160], [-20, 90]], np.float32)
    assert quadrangle_regularity(skewed) < quadrangle_regularity(square)
    assert quadrangle_regularity(None) == 0.0


def test_probability_confidence() -> None:
    confident = np.concatenate([np.zeros(750), np.ones(250)]).astype(np.float32)
    assert probability_confidence(confident) > 0.99
    unsure = np.full(1000, 0.5, np.float32)
    assert probability_confidence(unsure) < 0.01


def test_run_pipeline_local_folder(tmp_path, monkeypatch) -> None:
    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))
    import cv2

    from chessvision_tpu.ingest import run_pipeline

    # two synthetic uploads
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(raw / f"up{i}.jpg"), rng.integers(0, 256, (512, 512, 3), np.uint8))

    # stub ChessVision with a stub engine
    from tests.test_engine import StubClassifier, StubExtractor, _quad_logits, _start_position_logits

    from chessvision_tpu.engine import Engine

    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.float32)

    class StubCV:
        engine = Engine(
            StubExtractor(_quad_logits(quad)), {}, StubClassifier(_start_position_logits()), {}
        )

    table, run = run_pipeline(input_folder=raw, cv_model=StubCV(), table_name="b1")
    assert len(table) == 2
    cols = run.read_metrics_table("enrichment")
    assert list(cols["extraction_success"]) == [1, 1]
    assert all(f.count("/") == 7 for f in cols["fen"])
    assert (cols["quadrangle_regularity"] > 0.8).all()
    assert (cols["probability_distribution"] > 0.5).all()
    assert run.parameters["status"] == "completed"
