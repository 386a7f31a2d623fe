"""Evaluation metric tests — port of the reference's tests/test_metrics.py
(FEN↔label conversion and top-k accuracy math with synthetic tensors)."""

import numpy as np

from chessvision_tpu import constants
from chessvision_tpu.eval.evaluate import (
    TopKAccuracyResult,
    board_to_labels,
    compute_model_topk_accuracy,
    compute_position_accuracy,
)


def test_board_to_labels() -> None:
    fen = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"
    labels = board_to_labels(fen)
    assert labels[:8] == ["r", "n", "b", "q", "k", "b", "n", "r"]
    assert labels[8:16] == ["p"] * 8
    assert labels[16:48] == ["f"] * 32
    assert labels[48:56] == ["P"] * 8
    assert labels[56:] == ["R", "N", "B", "Q", "K", "B", "N", "R"]

    labels = board_to_labels("8/8/8/8/8/8/8/8")
    assert all(label == "f" for label in labels)

    labels = board_to_labels("8/8/8/8/4Q3/8/8/8")
    e5_idx = 4 * 8 + 4  # e4 in FEN order (5th rank from top, 5th file)
    assert labels[e5_idx] == "Q"
    assert sum(1 for label in labels if label != "f") == 1


def test_compute_top_k_accuracy() -> None:
    predictions = np.zeros((64, 13), dtype=np.float32)
    true_fen = "8/8/8/8/8/8/8/8"

    predictions[:32, constants.LABEL_INDICES["f"]] = 1.0
    predictions[32:48, constants.LABEL_INDICES["p"]] = 1.0
    predictions[32:48, constants.LABEL_INDICES["f"]] = 0.9
    predictions[48:, constants.LABEL_INDICES["P"]] = 1.0
    predictions[48:, constants.LABEL_INDICES["p"]] = 0.9
    predictions[48:, constants.LABEL_INDICES["f"]] = 0.8

    result = compute_model_topk_accuracy(predictions, true_fen, k=3)
    assert isinstance(result, TopKAccuracyResult)
    assert result.k == 3
    assert len(result.accuracies) == 3
    assert result.top_1 == 0.5
    assert result.top_2 == 0.75
    assert result.top_3 == 1.0


def test_compute_top_k_accuracy_variable_k() -> None:
    predictions = np.zeros((64, 13), dtype=np.float32)
    true_fen = "8/8/8/8/8/8/PPPPPPPP/8"
    for i in range(48, 56):
        predictions[i, constants.LABEL_INDICES["P"]] = 1.0
    for i in list(range(48)) + list(range(56, 64)):
        predictions[i, constants.LABEL_INDICES["f"]] = 1.0

    result_k1 = compute_model_topk_accuracy(predictions, true_fen, k=1)
    assert result_k1.k == 1
    assert len(result_k1.accuracies) == 1
    assert result_k1.top_1 == 1.0
    assert result_k1.top_2 == 0.0  # not computed

    result_k5 = compute_model_topk_accuracy(predictions, true_fen, k=5)
    assert result_k5.k == 5
    assert len(result_k5.accuracies) == 5
    assert all(acc == 1.0 for acc in result_k5.accuracies)


def test_compute_position_metrics() -> None:
    true_fen = "r1bqk2r/pppp1ppp/2n2n2/2b1p3/2B1P3/3P1N2/PPP2PPP/RNBQK2R"
    predictions = np.zeros((64, 13), dtype=np.float32)
    true_labels = board_to_labels(true_fen)
    for square, label in enumerate(true_labels):
        if square < 8 or square >= 56:
            predictions[square, constants.LABEL_INDICES["p" if square < 8 else "P"]] = 1.0
            predictions[square, constants.LABEL_INDICES[label]] = 0.8
        else:
            predictions[square, constants.LABEL_INDICES[label]] = 1.0

    result = compute_model_topk_accuracy(predictions, true_fen, k=3)
    assert result.k == 3
    assert len(result.accuracies) == 3
    assert result.top_1 < 1.0
    assert result.top_2 > result.top_1


def test_compute_position_metrics_with_errors() -> None:
    true_fen = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"
    predictions = np.zeros((64, 13), dtype=np.float32)
    true_labels = board_to_labels(true_fen)
    for square, label in enumerate(true_labels):
        if square < 8:
            predictions[square, constants.LABEL_INDICES["p"]] = 0.9
            predictions[square, constants.LABEL_INDICES["q"]] = 0.8
            predictions[square, constants.LABEL_INDICES[label]] = 0.7
        elif square >= 56:
            predictions[square, constants.LABEL_INDICES["P"]] = 0.9
            predictions[square, constants.LABEL_INDICES[label]] = 0.8
            predictions[square, constants.LABEL_INDICES["Q"]] = 0.7
        else:
            predictions[square, constants.LABEL_INDICES[label]] = 0.9
            predictions[square, constants.LABEL_INDICES["f"]] = 0.8
            predictions[square, constants.LABEL_INDICES["p"]] = 0.7

    result = compute_model_topk_accuracy(predictions, true_fen, k=3)
    assert result.k == 3
    # NOTE on the arithmetic (matches the reference test exactly,
    # test_metrics.py:162-174): middle 48 squares hit at top-1, but 8 of
    # them ('p' second-rank squares) conflict — true start position has
    # pawn rows at indices 8-15 with 'p' predicted at 0.7... the reference
    # derived 40/57/64.
    assert abs(result.top_1 - 40 / 64) < 1e-6
    assert abs(result.top_2 - 57 / 64) < 1e-6
    assert abs(result.top_3 - 64 / 64) < 1e-6


def test_compute_position_accuracy() -> None:
    fen = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"
    perfect = compute_position_accuracy(fen, fen)
    assert perfect.accuracy == 1.0 and perfect.num_correct == 64
    off = compute_position_accuracy("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNQ", fen)
    assert off.num_correct == 63


START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


class _ShapeRecordingEngine:
    """Stub engine: records every batch shape it receives and returns a
    well-formed all-found BatchResult (perfect start-position FENs)."""

    def __init__(self) -> None:
        self.shapes: list[tuple[int, int, int]] = []

    def process_batch(self, batch, threshold=0.5):
        from chessvision_tpu.cv_types import BatchResult

        b, h, w = batch.shape[:3]
        self.shapes.append((b, h, w))
        return BatchResult(
            logits=np.zeros((b, 256, 256), np.float32),
            binary_mask=np.zeros((b, 256, 256), np.uint8),
            quadrangle=np.zeros((b, 4, 2), np.float32),
            board_found=np.ones(b, bool),
            board_image=np.zeros((b, 512, 512), np.uint8),
            probabilities=np.full((b, 64, 13), 1.0 / 13, np.float32),
            fens=[START_FEN] * b,
            original_fens=[START_FEN] * b,
            validation_fixes=[[] for _ in range(b)],
        )


def _write_test_root(tmp_path, sizes) -> "object":
    import cv2

    root = tmp_path / "test"
    (root / "batch0" / "raw").mkdir(parents=True)
    (root / "batch0" / "ground_truth").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, size in enumerate(sizes):
        img = rng.integers(0, 256, (size, size, 3), np.uint8)
        cv2.imwrite(str(root / "batch0" / "raw" / f"img{i}.JPG"), img)
        (root / "batch0" / "ground_truth" / f"img{i}.txt").write_text(START_FEN)
    return root


def test_evaluate_model_groups_by_native_resolution(tmp_path, monkeypatch) -> None:
    """Mixed-resolution test batches evaluate at NATIVE size (reference
    core.py:197-223 warps out of the original frame) — the harness must
    not pre-shrink a high-res image to 512²."""
    from types import SimpleNamespace

    from chessvision_tpu.eval.evaluate import evaluate_model

    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))
    root = _write_test_root(tmp_path, [512, 1024, 512])
    engine = _ShapeRecordingEngine()
    agg = evaluate_model(
        cv_model=SimpleNamespace(engine=engine), test_root=root, batch_size=8
    )
    assert agg["num_images"] == 3
    assert agg["top_1_accuracy_validated"] == 1.0
    assert agg["extraction_failures"] == 0
    # one batch per native shape, full resolution preserved; tails padded
    # to the uniform batch size (one compiled program per shape), plus one
    # warm-timing re-dispatch per shape group
    assert sorted(set(engine.shapes)) == [(8, 512, 512), (8, 1024, 1024)]
    assert len(engine.shapes) == 4


def test_evaluate_model_forced_uniform_size(tmp_path, monkeypatch) -> None:
    """Explicit image_size keeps the legacy uniform-resize behavior."""
    from types import SimpleNamespace

    from chessvision_tpu.eval.evaluate import evaluate_model

    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))
    root = _write_test_root(tmp_path, [512, 1024])
    engine = _ShapeRecordingEngine()
    evaluate_model(
        cv_model=SimpleNamespace(engine=engine),
        test_root=root,
        image_size=512,
        batch_size=8,
    )
    # one scoring batch + one warm-timing re-dispatch, both at the forced size
    assert engine.shapes == [(8, 512, 512), (8, 512, 512)]


def test_evaluate_model_metrics_table_order(tmp_path, monkeypatch) -> None:
    """Per-sample rows come out in generator (filename) order even though
    shape groups are processed out of order."""
    from types import SimpleNamespace

    from chessvision_tpu import runstore
    from chessvision_tpu.eval.evaluate import evaluate_model

    monkeypatch.setenv("CVTPU_STORE_ROOT", str(tmp_path / "store"))
    root = _write_test_root(tmp_path, [1024, 512, 1024, 512])
    run = runstore.init("chessvision-testing")
    evaluate_model(
        cv_model=SimpleNamespace(engine=_ShapeRecordingEngine()),
        test_root=root,
        run=run,
        include_metrics_table=True,
        save_artifacts=False,
        batch_size=8,
    )
    table = run.read_metrics_table("test_per_image")
    ids = list(table["example_id"])
    assert ids == [f"img{i}.JPG" for i in range(4)]
