"""End-to-end benchmark: boards/sec image→FEN on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 500 boards/sec single-chip target from
BASELINE.json.  Uses trained weights from weights/ when present, random
init otherwise (identical compute graph either way).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_BOARDS_PER_SEC = 500.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--quick", action="store_true", help="tiny config for CPU smoke runs")
    parser.add_argument("--extractor", default=None, help="extractor model id (default unet)")
    parser.add_argument("--classifier", default=None, help="classifier model id (default resnet18)")
    args = parser.parse_args()

    import jax

    if args.quick:
        args.batch_size, args.iters, args.warmup = 4, 2, 1

    from chessvision_tpu import ChessVision, constants

    model_kwargs = {}
    if args.quick:
        model_kwargs = {"extractor": {"base": 8} if not args.extractor else {"width": 8},
                        "classifier": {"width": 8} if args.classifier == "yolo" else {}}

    cv = ChessVision(
        board_extractor_model_id=args.extractor,
        classifier_model_id=args.classifier,
        lazy_load=False,
        model_kwargs=model_kwargs,
    )
    engine = cv.engine

    # Load real test images, tiled up to the batch size.
    test_dir = Path(constants.DATA_ROOT) / "test" / "initial" / "raw"
    images = []
    if test_dir.exists():
        try:
            import cv2

            for p in sorted(test_dir.glob("*.JPG")):
                im = cv2.imread(str(p))
                if im is not None and im.shape == (512, 512, 3):
                    images.append(im)
        except ImportError:
            pass
    if images:
        batch = np.stack((images * ((args.batch_size // len(images)) + 1))[: args.batch_size])
    else:
        batch = np.random.default_rng(0).integers(0, 256, (args.batch_size, 512, 512, 3), np.uint8)

    # p50 single-image latency first — this tunneled backend degrades with
    # accumulated transfer volume within a process, so latency is measured
    # in the cleanest state (after its own compile warmup).
    single = batch[:1]
    engine.process_batch(single)  # compile B=1
    lat = []
    for _ in range(7):
        t = time.perf_counter()
        engine.process_batch(single)
        lat.append(time.perf_counter() - t)
    p50_ms = float(np.median(lat) * 1000)

    # Warmup (includes compile)
    for _ in range(args.warmup):
        out = engine.run_device(batch)
    jax.block_until_ready(out)

    # Throughput, bounded queue depth (block each iteration): the most
    # reproducible regime on this tunneled backend — deep async queues and
    # interleaved uploads degrade the relay. Reported e2e includes the
    # host→device upload every iteration.
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = engine.run_device(batch)
        jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    boards_per_sec = args.batch_size * args.iters / elapsed

    # compute-only (device-resident input) for the same batch
    import jax.numpy as jnp

    dev_batch = jnp.asarray(batch)
    thr = jnp.float32(0.5)
    jax.block_until_ready(engine._jitted(engine._ex_vars, engine._cl_vars, dev_batch, thr))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = engine._jitted(engine._ex_vars, engine._cl_vars, dev_batch, thr)
        jax.block_until_ready(out)
    compute_elapsed = time.perf_counter() - t0
    compute_boards_per_sec = args.batch_size * args.iters / compute_elapsed

    result = {
        "metric": "boards_per_sec_e2e",
        "value": round(boards_per_sec, 2),
        "unit": "boards/s",
        "vs_baseline": round(boards_per_sec / BASELINE_BOARDS_PER_SEC, 3),
        "compute_boards_per_sec": round(compute_boards_per_sec, 2),
        "p50_latency_ms": round(p50_ms, 2),
        "batch_size": args.batch_size,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
