"""Quickstart: load a test image, run the full pipeline, print the FEN.

The equivalent of the reference's examples/quickstart-example.ipynb.
"""

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

from pathlib import Path

import cv2

from chessvision_tpu import ChessVision, constants


def main() -> None:
    image_path = Path(constants.DATA_ROOT) / "test" / "initial" / "raw"
    image_file = sorted(image_path.glob("*.JPG"))[0]
    image = cv2.imread(str(image_file))
    print(f"Processing {image_file.name} ({image.shape})")

    cv_model = ChessVision(lazy_load=False)
    result = cv_model.process_image(image)

    if result.position is None:
        print("No chessboard detected")
        return
    print(f"FEN:           {result.position.fen}")
    print(f"original FEN:  {result.position.original_fen}")
    print(f"fixes:         {result.position.validation_fixes}")
    print(f"time:          {result.processing_time * 1000:.1f} ms")

    # side-by-side mask / board / predicted-position figure (the
    # reference notebook's display_comparison)
    from chessvision_tpu.eval.render import display_comparison

    out = Path("/tmp/quickstart_comparison.png")
    display_comparison(result, out)
    print(f"comparison:    {out}")


if __name__ == "__main__":
    main()
