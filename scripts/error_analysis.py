"""Per-square error analysis of the test set — the curation loop's eyes.

Runs the engine over every test image and breaks each wrong square down:
which square, true→predicted confusion, the model's confidence in its
error, whether validation fixed it — then aggregates confusions, square
colors, ranks, and board-level clustering.  The output drives targeted
data interventions (reference workflow: DATA_COLLECTION.md / the 3LC
loop in train_unet.py:186-196 — inspect per-sample metrics, fix data,
retrain), replacing 3LC's dashboard inspection with a script + report.

Writes scripts/out/error_analysis.json + prints a markdown summary.

CPU by default (bit-matches the committed goldens; leaves the TPU free);
``--platform tpu`` analyzes the TPU's own numerics instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter, defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--out", default=str(REPO / "scripts" / "out" / "error_analysis.json"))
    ap.add_argument("--board-extractor-weights", default=None,
                    help="checkpoint override — analyze a candidate instead of the promoted weights")
    ap.add_argument("--classifier-weights", default=None)
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from chessvision_tpu import ChessVision, constants
    from chessvision_tpu.chessboard import fen_to_labels
    from chessvision_tpu.eval.evaluate import get_test_generator

    # FEN-order index -> algebraic square name (rank 8 first, file a first)
    fen_square_names = [f"{'abcdefgh'[i % 8]}{8 - i // 8}" for i in range(64)]
    dark = set(constants.DARK_SQUARES)

    cv = ChessVision(
        board_extractor_weights=args.board_extractor_weights,
        classifier_weights=args.classifier_weights,
        lazy_load=False,
    )
    items = list(get_test_generator())

    shape_groups: dict[tuple, list] = {}
    for it in items:
        shape_groups.setdefault(it[0].shape, []).append(it)

    boards: list[dict] = []
    errors: list[dict] = []
    failure: dict | None = None
    done = 0
    for group in shape_groups.values():
        for start in range(0, len(group), args.chunk):
            part = group[start : start + args.chunk]
            batch = np.stack([img for img, _, _ in part])
            real = len(part)
            if real < args.chunk:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], args.chunk - real, axis=0)]
                )
            res = cv.engine.process_batch(batch)
            for i, (_, name, true_fen) in enumerate(part):
                if not res.board_found[i]:
                    # extraction failure: characterize the mask fragments
                    mask = (np.asarray(res.binary_mask[i])[..., 0] > 0).astype(np.uint8)
                    comp: dict = {}
                    try:
                        import cv2

                        n, _, stats, _ = cv2.connectedComponentsWithStats(mask)
                        areas = sorted(stats[1:, cv2.CC_STAT_AREA].tolist(), reverse=True)
                        comp = {
                            "num_components": int(n - 1),
                            "largest_area_frac": areas[0] / mask.size if areas else 0.0,
                            "top_areas": [int(a) for a in areas[:5]],
                        }
                    except ImportError:
                        pass
                    failure = {
                        "name": name,
                        "mask_area_frac": float(mask.mean()),
                        **comp,
                    }
                    boards.append({"name": name, "errors": 64, "found": False})
                    continue
                true = fen_to_labels(true_fen)
                raw_pred = fen_to_labels(res.original_fens[i])
                val_pred = fen_to_labels(res.fens[i])
                probs = np.asarray(res.probabilities[i])  # (64, 13) FEN order
                b_errors = []
                for sq in range(64):
                    if raw_pred[sq] == true[sq]:
                        continue
                    p = probs[sq]
                    order = np.argsort(p)[::-1]
                    true_idx = constants.LABEL_INDICES[true[sq]]
                    rec = {
                        "board": name,
                        "square": fen_square_names[sq],
                        "color": "dark" if fen_square_names[sq] in dark else "light",
                        "true": true[sq],
                        "pred": raw_pred[sq],
                        "p_pred": round(float(p[order[0]]), 4),
                        "p_true": round(float(p[true_idx]), 4),
                        "true_rank": int(np.where(order == true_idx)[0][0]) + 1,
                        "fixed_by_validation": val_pred[sq] == true[sq],
                        "broken_by_validation": False,
                    }
                    b_errors.append(rec)
                for sq in range(64):  # validation can also break a correct square
                    if raw_pred[sq] == true[sq] and val_pred[sq] != true[sq]:
                        b_errors.append(
                            {
                                "board": name,
                                "square": fen_square_names[sq],
                                "color": "dark" if fen_square_names[sq] in dark else "light",
                                "true": true[sq],
                                "pred": val_pred[sq],
                                "p_pred": None,
                                "p_true": None,
                                "true_rank": 1,
                                "fixed_by_validation": False,
                                "broken_by_validation": True,
                            }
                        )
                errors.extend(b_errors)
                boards.append({"name": name, "errors": len(b_errors), "found": True})
            done += real
            print(f"  {done}/{len(items)}", file=sys.stderr, flush=True)

    # ---- aggregates
    confusions = Counter((e["true"], e["pred"]) for e in errors if not e["broken_by_validation"])
    by_color = Counter(e["color"] for e in errors)
    by_rank = Counter(e["square"][1] for e in errors)
    by_true = Counter(e["true"] for e in errors)
    near_misses = [e for e in errors if e.get("true_rank") == 2]
    fixed = sum(1 for e in errors if e["fixed_by_validation"])
    broken = sum(1 for e in errors if e["broken_by_validation"])
    board_err = sorted(
        (b for b in boards if b["found"]), key=lambda b: -b["errors"]
    )

    report = {
        "platform": args.platform,
        "num_boards": len(items),
        "total_errors": len(errors),
        "errors_fixed_by_validation": fixed,
        "errors_introduced_by_validation": broken,
        "top2_near_misses": len(near_misses),
        "confusions": {f"{t}->{p}": c for (t, p), c in confusions.most_common()},
        "by_square_color": dict(by_color),
        "by_rank": dict(sorted(by_rank.items())),
        "by_true_label": dict(by_true.most_common()),
        "boards_by_errors": board_err[:12],
        "extraction_failure": failure,
        "errors": errors,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))

    # ---- markdown summary
    print(f"\n## Error analysis ({args.platform}, {len(items)} boards)\n")
    print(f"- wrong squares (raw): {len(errors) - broken} "
          f"({(len(errors) - broken) / (64 * len(items)):.2%} of all squares)")
    print(f"- fixed by validation: {fixed}; broken by validation: {broken}")
    print(f"- top-2 near misses (true label ranked 2nd): {len(near_misses)}")
    print("\ntop confusions (true→pred):")
    for (t, p), c in confusions.most_common(10):
        print(f"  {t or 'empty':>5} → {p or 'empty':<5} ×{c}")
    print(f"\nby square color: {dict(by_color)}")
    print(f"by rank: {dict(sorted(by_rank.items()))}")
    print("\nboards with most errors:")
    for b in board_err[:8]:
        print(f"  {b['name']}: {b['errors']}")
    if failure:
        print(f"\nextraction failure: {json.dumps(failure)}")


if __name__ == "__main__":
    main()
