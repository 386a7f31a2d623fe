"""Mine classifier training squares from REAL engine warp geometry.

The squares training set was cut from cleanly-rectified boards; the
engine's own crops carry real-world geometry — slightly off-center
squares from imperfect quads, perspective resampling, piece overhang
from neighbouring squares.  Round-4 error analysis shows the surviving
classifier errors are exactly these boundary cases (piece↔empty at
misaligned crops).  This miner closes the domain gap by
self-distillation (the 3LC curation move: mine data where the model
lives, reference workflow DATA_COLLECTION.md):

  1. run the batched engine over the board_extraction TRAIN images
     (568 boards the classifier never saw as squares),
  2. cut the 64 engine-warped squares per found board (same rank-major
     order as ops/squares.py),
  3. keep squares the current classifier labels with confidence ≥
     --min-conf (default 0.955; calibrate against the engine's measured
     max-prob distribution — the round-4 mining run used 0.955 because
     the then-bf16 softmax capped confident predictions near 0.97,
     since fixed in engine.py by computing softmax in f32),
  4. write an ImageFolder in the squares/ layout (13 class dirs,
     ``f`` = empty, ``_x`` = black pieces), downsampling any class over
     --max-per-class so empties don't drown the pieces.

Fine-tune with:
    python -m chessvision_tpu.train.train_classifier \
        --extra-data store/datasets/warped_squares ...
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def dir_name(label: str) -> str:
    """LABEL_NAMES entry → squares/ ImageFolder dir ('b' → '_b')."""
    return label if label in ("f",) or label.isupper() else "_" + label


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="tpu")
    # Under the shipping arbitrate engine the probabilities are a soft
    # BLEND of two classifier passes (w ~ 0.5 at near-identity grid
    # corrections), which caps per-square max-prob at ~0.98 (measured
    # round 5: median 0.95, p99 0.968, ZERO squares over 0.99) — a 0.99
    # threshold mines nothing.  0.955 keeps the top ~25% most-confident
    # squares, matching the round-4 mining yield.
    ap.add_argument("--min-conf", type=float, default=0.955)
    ap.add_argument("--max-per-class", type=int, default=1500)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--out", default=str(REPO / "store" / "datasets" / "warped_squares"))
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    from chessvision_tpu import ChessVision, constants
    from chessvision_tpu.train import data as data_lib

    cv = ChessVision(lazy_load=False)
    data = data_lib.load_board_extraction()
    images = data.train_images  # (N, 256, 256, 3) uint8 BGR
    ids = data.train_ids
    print(f"mining {len(images)} train boards", file=sys.stderr)

    mined: dict[str, list[tuple[str, np.ndarray]]] = defaultdict(list)
    found_boards = 0
    for start in range(0, len(images), args.chunk):
        batch = images[start : start + args.chunk]
        real = len(batch)
        if real < args.chunk:
            batch = np.concatenate([batch, np.repeat(batch[-1:], args.chunk - real, axis=0)])
        res = cv.engine.process_batch(batch)
        probs = np.asarray(res.probabilities)  # (B, 64, 13)
        boards = np.asarray(res.board_image)  # (B, 512, 512) uint8
        for bi in range(real):
            if not res.board_found[bi]:
                continue
            found_boards += 1
            stem = Path(ids[start + bi]).stem
            for sq in range(64):
                p = probs[bi, sq]
                conf = float(p.max())
                if conf < args.min_conf:
                    continue
                label = constants.LABEL_NAMES[int(p.argmax())]
                r, c = sq // 8, sq % 8
                crop = boards[bi, r * 64 : (r + 1) * 64, c * 64 : (c + 1) * 64]
                mined[label].append((f"{stem}_{sq:02d}.png", crop))
        print(f"  {min(start + args.chunk, len(images))}/{len(images)}", file=sys.stderr, flush=True)

    out = Path(args.out)
    rng = np.random.default_rng(args.seed)
    counts = {}
    for label, items in sorted(mined.items()):
        if len(items) > args.max_per_class:
            keep = rng.choice(len(items), args.max_per_class, replace=False)
            items = [items[i] for i in sorted(keep)]
        d = out / dir_name(label)
        d.mkdir(parents=True, exist_ok=True)
        for name, crop in items:
            cv2.imwrite(str(d / name), crop)
        counts[dir_name(label)] = len(items)

    total = sum(counts.values())
    print(f"boards used: {found_boards}; squares written: {total}")
    for k, v in sorted(counts.items()):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
