"""Detailed walk through every pipeline stage with tensor statistics.

The equivalent of the reference's examples/detailed-example.py: per-stage
shapes/ranges, the extracted quadrangle, and top-3 predictions for a few
squares — but stages here come from one fused batched device program.
"""

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

from pathlib import Path

import cv2
import numpy as np

from chessvision_tpu import ChessVision, constants


def main() -> None:
    image_file = sorted((Path(constants.DATA_ROOT) / "test" / "initial" / "raw").glob("*.JPG"))[0]
    image = cv2.imread(str(image_file))
    print(f"Input image: {image.shape} {image.dtype}, range [{image.min()}, {image.max()}]")

    cv_model = ChessVision(lazy_load=False)
    result = cv_model.engine.process_batch(image[None])

    logits = result.logits[0]
    print(f"\nSegmentation logits: {logits.shape}, range [{logits.min():.2f}, {logits.max():.2f}]")
    mask = result.binary_mask[0]
    print(f"Binary mask: {mask.shape}, foreground {100 * (mask > 0).mean():.1f}%")

    if not result.board_found[0]:
        print("No board found")
        return

    quad = result.quadrangle[0]
    print(f"Quadrangle (original-image coords):\n{np.round(quad, 1)}")
    board = result.board_image[0]
    print(f"Extracted board: {board.shape}, range [{board.min()}, {board.max()}]")

    probs = result.probabilities[0]  # (64, 13)
    print(f"\nClassifier probabilities: {probs.shape}")
    names = result.extra["square_names"]
    print("\nTop-3 per square (first 8 squares):")
    for sq in range(8):
        order = np.argsort(probs[sq])[::-1][:3]
        tops = ", ".join(f"{constants.LABEL_NAMES[i]}:{probs[sq, i]:.3f}" for i in order)
        print(f"  {names[sq]}: {tops}")

    print(f"\noriginal FEN: {result.original_fens[0]}")
    print(f"validated FEN: {result.fens[0]}")
    for fix in result.validation_fixes[0]:
        print(f"  fix: {fix.square_name} {fix.original_piece} -> {fix.corrected_piece} ({fix.rule_name})")


if __name__ == "__main__":
    main()
