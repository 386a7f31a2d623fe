"""Production-throughput pattern: packed inputs + double-buffered streaming.

Shows the intended high-throughput deployment shape on a directly-attached
TPU host (reference has no analogue — its pipeline is per-image):

1. pack frames on host — ``pack_inputs_yuv444`` (C++-fused, 416
   KB/board, 1.85× fewer host→device bytes than raw frames, BIT-IDENTICAL
   FENs) or ``pack_inputs`` (448 KB, simplest) — and
2. feed batches through ``Engine.run_stream`` so the upload of batch i+1
   overlaps the device compute of batch i.

On this repo's dev relay the link itself is the bottleneck and synchronous
upload measures faster (see bench.py); on normal GB/s hosts the streamed
path below is compute-bound at several hundred boards/s per v5e chip.

Run: python examples/streaming_throughput.py [n_batches] [batch_size]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from chessvision_tpu import ChessVision, constants  # noqa: E402
from chessvision_tpu.engine import (  # noqa: E402
    pack_inputs_yuv444,
    validate_labels_batch,
)
from chessvision_tpu.chessboard import labels_to_fen  # noqa: E402


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    # real test frames, tiled to the batch size
    test_dir = Path(constants.DATA_ROOT) / "test" / "initial" / "raw"
    try:
        import cv2

        frames = [
            im
            for p in sorted(test_dir.glob("*.JPG"))
            if (im := cv2.imread(str(p))) is not None and im.shape == (512, 512, 3)
        ]
    except ImportError:
        frames = []
    if not frames:
        frames = [np.random.default_rng(0).integers(0, 256, (512, 512, 3), np.uint8)]
    batch = np.stack((frames * ((bsz // len(frames)) + 1))[:bsz])

    engine = ChessVision(lazy_load=False).engine
    square_names = constants.SQUARE_NAMES_NORMAL

    # host-side packing generator — in production this is the ingest
    # process/thread pool (or the C++ cvloader) running ahead of the device
    def packed_batches():
        for _ in range(n_batches):
            yield pack_inputs_yuv444(batch)

    # warm the compiled program (first compile is slow; cached afterwards)
    np.asarray(engine.run_yuv444(*pack_inputs_yuv444(batch[:bsz]))["found"])

    t0 = time.perf_counter()
    n_boards = 0
    for out in engine.run_stream(packed_batches(), kind="yuv444"):
        probs = np.asarray(out["probabilities"])  # D2H sync point
        found = np.asarray(out["found"])
        validated, _ = validate_labels_batch(probs, square_names)
        fens = [
            labels_to_fen(validated[i], square_names) if found[i] else ""
            for i in range(len(found))
        ]
        n_boards += len(fens)
    dt = time.perf_counter() - t0
    print(f"{n_boards} boards in {dt:.2f}s = {n_boards / dt:.1f} boards/s (streamed)")
    print("sample FEN:", fens[0])


if __name__ == "__main__":
    main()
