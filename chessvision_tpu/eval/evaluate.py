"""End-to-end evaluation: image → FEN accuracy over the checked-in test set.

Port of the reference's scripts/eval/evaluate.py metric definitions —
per-square position accuracy before/after validation (evaluate.py:37-59),
top-k accuracy over raw model probabilities (evaluate.py:112-140),
extraction-failure counting and timing (evaluate.py:346-360) — with the
evaluation driven through the batched fused engine instead of a per-image
loop, and results recorded to the local runstore.
"""

from __future__ import annotations

import argparse
import logging
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Generator, Sequence

import numpy as np

from chessvision_tpu import constants
from chessvision_tpu.chessboard import fen_to_labels

logger = logging.getLogger(__name__)


@dataclass
class PositionAccuracy:
    """Per-square accuracy of a predicted position (evaluate.py:28-34)."""

    accuracy: float
    num_correct: int
    total_squares: int = 64


def compute_position_accuracy(predicted_fen: str, true_fen: str) -> PositionAccuracy:
    """Fraction of the 64 squares whose piece matches (evaluate.py:37-52)."""
    pred = fen_to_labels(predicted_fen)
    true = fen_to_labels(true_fen)
    correct = sum(1 for a, b in zip(pred, true) if a == b)
    return PositionAccuracy(accuracy=correct / 64, num_correct=correct)


def board_to_labels(fen: str) -> list[str]:
    """True labels in FEN order for a board FEN (evaluate.py:62-86 takes a
    chess.BaseBoard; here the FEN string directly)."""
    return fen_to_labels(fen)


@dataclass
class TopKAccuracyResult:
    k: int
    accuracies: Sequence[float]

    @property
    def top_1(self) -> float:
        return self.accuracies[0]

    @property
    def top_2(self) -> float:
        return self.accuracies[1] if len(self.accuracies) > 1 else 0.0

    @property
    def top_3(self) -> float:
        return self.accuracies[2] if len(self.accuracies) > 2 else 0.0


def compute_model_topk_accuracy(
    model_probabilities: np.ndarray,
    true_fen: str,
    k: int = 3,
) -> TopKAccuracyResult:
    """Top-k per-square accuracy (evaluate.py:112-140), vectorized."""
    true_labels = fen_to_labels(true_fen)
    true_idx = np.asarray([constants.LABEL_INDICES[l] for l in true_labels])
    order = np.argsort(model_probabilities, axis=1)[:, ::-1][:, :k]  # (64, k)
    hits_at = order == true_idx[:, None]  # (64, k)
    cum = hits_at.cumsum(axis=1) > 0
    accuracies = [float(cum[:, i].mean()) for i in range(k)]
    return TopKAccuracyResult(k=k, accuracies=accuracies)


def get_test_generator(
    test_root: Path | None = None, batches: Sequence[str] | None = None
) -> Generator[tuple[np.ndarray, str, str], None, None]:
    """Yield (image, filename, true_fen) over the checked-in test batches
    (evaluate.py:143-152; FEN files live in ground_truth/*.txt)."""
    import cv2

    root = Path(test_root or (Path(constants.DATA_ROOT) / "test"))
    batch_dirs = (
        [root / b for b in batches] if batches else sorted(p for p in root.iterdir() if p.is_dir())
    )
    for bd in batch_dirs:
        raw = bd / "raw"
        if not raw.exists():
            continue
        for img_path in sorted(raw.glob("*.JPG")):
            fen_path = bd / "ground_truth" / (img_path.stem + ".txt")
            if not fen_path.exists():
                fen_path = bd / "ground_truth" / (img_path.stem.lower() + ".txt")
            if not fen_path.exists():
                continue
            img = cv2.imread(str(img_path))
            if img is None:
                continue
            yield img, img_path.name, fen_path.read_text().strip()


def evaluate_model(
    *,
    run=None,
    threshold: float = 0.5,
    board_extractor_weights: str | None = None,
    board_extractor_model_id: str | None = None,
    classifier_weights: str | None = None,
    classifier_model_id: str | None = None,
    include_metrics_table: bool = False,
    save_artifacts: bool = False,
    batch_size: int = 32,
    limit: int | None = None,
    image_size: int | None = None,
    cv_model=None,
    test_root: Path | None = None,
) -> dict:
    """Run the full evaluation suite; returns the aggregate metric dict
    (the reference's run parameter payload, evaluate.py:346-363)."""
    from chessvision_tpu import runstore
    from chessvision_tpu.core import ChessVision

    if run is None:
        run = runstore.init("chessvision-testing")

    if cv_model is None:
        cv_model = ChessVision(
            board_extractor_weights=board_extractor_weights,
            board_extractor_model_id=board_extractor_model_id,
            classifier_weights=classifier_weights,
            classifier_model_id=classifier_model_id,
            lazy_load=False,
        )

    items = list(get_test_generator(test_root))
    if limit:
        items = items[:limit]
    if not items:
        logger.warning("No test items found")
        return {}

    # The fused engine takes uniform-shape batches; group test images BY
    # NATIVE SHAPE and feed each group at full resolution, so the board is
    # warped out of the original frame exactly as the reference does
    # (core.py:197-223 scales the quadrangle back to the original) — a
    # high-res test batch must not be scored through a pre-shrunk 512².
    # ``image_size`` forces the legacy uniform resize when explicitly set.
    if image_size is not None:
        import cv2

        imgs_native = [
            im
            if im.shape[:2] == (image_size, image_size)
            # INTER_AREA to match the engine's resize semantics
            # (reference core.py:212)
            else cv2.resize(im, (image_size, image_size), interpolation=cv2.INTER_AREA)
            for im, _, _ in items
        ]
    else:
        imgs_native = [im for im, _, _ in items]
    names = [n for _, n, _ in items]
    true_fens = [f for _, _, f in items]
    shape_groups: dict[tuple[int, ...], list[int]] = {}
    for i, im in enumerate(imgs_native):
        shape_groups.setdefault(im.shape[:2], []).append(i)

    top_1 = top_1_validated = top_2 = top_3 = 0.0
    extraction_failures = 0
    validation_fixes = 0
    validation_improvements = 0
    evaluated = 0
    per_sample_rows: dict[str, list] = {}

    t0 = time.time()
    res_by_item: dict[int, tuple] = {}
    rows_computed = 0
    warm_chunks: list[tuple[np.ndarray, int]] = []  # (chunk, group size) per shape
    for idxs in shape_groups.values():
        group = np.stack([imgs_native[i] for i in idxs])
        for start in range(0, len(idxs), batch_size):
            chunk = group[start : start + batch_size]
            real = len(chunk)
            # pad the tail to the full batch size: ONE compiled program per
            # image shape instead of one per (shape × remainder) — remote
            # XLA compiles are minutes each (CLAUDE.md); padded rows repeat
            # the last image and are dropped below
            if real < batch_size:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], batch_size - real, axis=0)]
                )
            res = cv_model.engine.process_batch(chunk, threshold)
            rows_computed += len(chunk)  # padded rows run through the pipeline too
            for bi, i in enumerate(idxs[start : start + batch_size]):
                res_by_item[i] = (res, bi)
        warm_chunks.append((chunk, len(idxs)))
    elapsed = time.time() - t0

    # Warm per-prediction time (the reference's avg_time_per_prediction is a
    # warm per-image number, evaluate.py:356): re-dispatch one already-compiled
    # chunk per shape group and divide by the rows it actually computes.  The
    # pass above pays every first compile (minutes on remote XLA backends), so
    # its aggregate is recorded separately as the compile-inclusive cold time.
    warm_weighted = 0.0
    for chunk, n_items in warm_chunks:
        t1 = time.time()
        cv_model.engine.process_batch(chunk, threshold)
        warm_weighted += (time.time() - t1) / len(chunk) * n_items
    avg_warm = warm_weighted / len(items)

    artifacts_dir = Path(run.bulk_data_url) / "artifacts"
    for idx in range(len(items)):
        res, bi = res_by_item[idx]
        name, true_fen = names[idx], true_fens[idx]
        # Per-sample artifacts live IN the metrics table (path columns),
        # like the reference's image columns (evaluate.py:248-261,
        # 373-403); --save-artifacts also writes them without a table.
        artifact_paths: dict[str, Path] = {}
        if save_artifacts or include_metrics_table:
            from chessvision_tpu.eval.render import save_eval_artifacts

            artifact_paths = save_eval_artifacts(
                artifacts_dir,
                name,
                fen=res.fens[bi] if res.board_found[bi] else None,
                binary_mask=res.binary_mask[bi],
                board_image=res.board_image[bi] if res.board_found[bi] else None,
            )
        artifact_cols = tuple(
            (col, str(artifact_paths.get(kind, "")))
            for col, kind in (
                ("predicted_board_image", "predicted_board"),
                ("mask_image", "binary_mask"),
                ("extracted_board_image", "extracted_board"),
            )
        )
        if not res.board_found[bi]:
            extraction_failures += 1
            if include_metrics_table:
                for k, v in (
                    ("example_id", name),
                    ("accuracy", 0.0),
                    ("accuracy_validated", 0.0),
                    ("top_2", 0.0),
                    ("top_3", 0.0),
                    ("num_fixes", 0),
                    ("extraction_failure", 1),
                ) + artifact_cols:
                    per_sample_rows.setdefault(k, []).append(v)
            continue
        evaluated += 1
        orig_acc = compute_position_accuracy(res.original_fens[bi], true_fen)
        val_acc = compute_position_accuracy(res.fens[bi], true_fen)
        topk = compute_model_topk_accuracy(res.probabilities[bi], true_fen, k=3)
        top_1 += topk.top_1
        top_2 += topk.top_2
        top_3 += topk.top_3
        top_1_validated += val_acc.accuracy
        validation_fixes += len(res.validation_fixes[bi])
        if val_acc.accuracy > orig_acc.accuracy:
            validation_improvements += 1
        if include_metrics_table:
            for k, v in (
                ("example_id", name),
                ("accuracy", orig_acc.accuracy),
                ("accuracy_validated", val_acc.accuracy),
                ("top_2", topk.top_2),
                ("top_3", topk.top_3),
                ("num_fixes", len(res.validation_fixes[bi])),
                ("extraction_failure", 0),
            ) + artifact_cols:
                per_sample_rows.setdefault(k, []).append(v)

    n = max(evaluated, 1)
    aggregates = {
        "top_1_accuracy": top_1 / n,
        "top_1_accuracy_validated": top_1_validated / n,
        "top_2_accuracy": top_2 / n,
        "top_3_accuracy": top_3 / n,
        "extraction_failures": extraction_failures,
        "validation_fixes": validation_fixes,
        "validation_improvements": validation_improvements,
        "num_images": len(items),
        # warm per-image time (one extra dispatch per compiled shape; the
        # usable number, like the reference's evaluate.py:356)
        "avg_time_per_prediction": avg_warm,
        # compile-inclusive first-pass time per COMPUTED row (tail padding
        # included in the denominator — a padded row runs the full pipeline)
        "avg_time_per_prediction_cold": elapsed / max(rows_computed, 1),
        "threshold": threshold,
    }
    run.set_parameters({"test_results": aggregates})
    if include_metrics_table and per_sample_rows:
        cols = {
            k: (np.asarray(v, object) if k == "example_id" else np.asarray(v))
            for k, v in per_sample_rows.items()
        }
        run.write_metrics_table("test_per_image", cols)
    run.set_status_completed()
    logger.info("Evaluation: %s", aggregates)
    return aggregates


def evaluate_segmentation(
    *,
    run=None,
    threshold: float = 0.5,
    board_extractor_weights: str | None = None,
    board_extractor_model_id: str | None = None,
    batch_size: int = 16,
    cv_model=None,
) -> dict:
    """Segmentation-stage metrics on the board_extraction val split: mean
    dice and IoU of the thresholded mask vs ground truth, through the
    engine's extractor (the BASELINE 'mask IoU parity' metric)."""
    import jax
    import jax.numpy as jnp

    from chessvision_tpu import runstore
    from chessvision_tpu.core import ChessVision
    from chessvision_tpu.train import data as data_lib

    if cv_model is None:
        cv_model = ChessVision(
            board_extractor_weights=board_extractor_weights,
            board_extractor_model_id=board_extractor_model_id,
        )
    ex_mod, _, ex_vars = cv_model.board_extractor

    data = data_lib.load_board_extraction()

    @jax.jit
    def seg_forward(imgs: jnp.ndarray) -> jnp.ndarray:
        return ex_mod.apply(ex_vars, imgs)[..., 0]

    dices, ious = [], []
    n = len(data.val_images)
    for start in range(0, n, batch_size):
        imgs = jnp.asarray(data.val_images[start : start + batch_size], jnp.float32) / 255.0
        masks = data.val_masks[start : start + batch_size]
        logits = np.asarray(seg_forward(imgs))
        pred = (1.0 / (1.0 + np.exp(-logits)) > threshold).astype(np.float32)
        inter = (pred * masks).sum(axis=(1, 2))
        union = np.maximum(pred, masks).sum(axis=(1, 2))
        sets = pred.sum(axis=(1, 2)) + masks.sum(axis=(1, 2))
        dices.extend((2 * inter + 1e-6) / (sets + 1e-6))
        ious.extend(np.where(union > 0, inter / np.maximum(union, 1e-9), 1.0))

    result = {
        "val_mask_dice": float(np.mean(dices)),
        "val_mask_iou": float(np.mean(ious)),
        "num_images": n,
        "threshold": threshold,
    }
    if run is None:
        run = runstore.init("chessvision-testing")
    run.set_parameters({"segmentation_results": result})
    run.set_status_completed()
    logger.info("Segmentation eval: %s", result)
    return result


def main() -> None:
    from chessvision_tpu.utils import setup_logger

    parser = argparse.ArgumentParser(description="Evaluate the image->FEN pipeline")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--board-extractor-weights", type=str, default=None)
    parser.add_argument("--board-extractor-model-id", type=str, default=None)
    parser.add_argument("--classifier-weights", type=str, default=None)
    parser.add_argument("--classifier-model-id", type=str, default=None)
    parser.add_argument("--include-metrics-table", action="store_true")
    parser.add_argument("--save-artifacts", action="store_true")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--seg-metrics", action="store_true", help="segmentation dice/IoU only")
    args = parser.parse_args()
    setup_logger("chessvision_tpu")
    if args.seg_metrics:
        import json

        result = evaluate_segmentation(
            threshold=args.threshold,
            board_extractor_weights=args.board_extractor_weights,
            board_extractor_model_id=args.board_extractor_model_id,
        )
        print(json.dumps(result, indent=2))
        return
    result = evaluate_model(
        threshold=args.threshold,
        board_extractor_weights=args.board_extractor_weights,
        board_extractor_model_id=args.board_extractor_model_id,
        classifier_weights=args.classifier_weights,
        classifier_model_id=args.classifier_model_id,
        include_metrics_table=args.include_metrics_table,
        save_artifacts=args.save_artifacts,
        limit=args.limit,
        batch_size=args.batch_size,
    )
    import json

    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
