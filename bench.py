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
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--quick", action="store_true", help="tiny config for CPU smoke runs")
    parser.add_argument("--extractor", default=None, help="extractor model id (default unet)")
    parser.add_argument("--classifier", default=None, help="classifier model id (default resnet18)")
    args = parser.parse_args()

    import jax

    if args.quick:
        args.batch_size, args.iters, args.warmup = 4, 2, 1

    from chessvision_tpu import ChessVision, constants

    cv = ChessVision(
        board_extractor_model_id=args.extractor,
        classifier_model_id=args.classifier,
        lazy_load=False,
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

    # Warmup (includes compile).  NOTE: transfers are the only reliable
    # sync on this remote backend (block_until_ready returns early), so
    # every timing below forces a tiny output transfer.
    for _ in range(args.warmup):
        out = engine.run_device(batch)
    np.asarray(out["found"])

    # Throughput, bounded queue depth (sync each iteration): the most
    # reproducible regime on this tunneled backend — deep async queues and
    # interleaved uploads degrade the relay. Reported e2e includes the
    # host→device upload of raw frames every iteration.
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = engine.run_device(batch)
        np.asarray(out["found"])
    elapsed = time.perf_counter() - t0
    boards_per_sec = args.batch_size * args.iters / elapsed

    # compute-only (device-resident input) for the same batch
    import jax.numpy as jnp

    dev_batch = jnp.asarray(batch)
    thr = jnp.float32(0.5)
    np.asarray(engine._jitted_closed(dev_batch, thr)["found"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = engine._jitted_closed(dev_batch, thr)
        np.asarray(out["found"])
    compute_elapsed = time.perf_counter() - t0
    compute_boards_per_sec = args.batch_size * args.iters / compute_elapsed

    # packed-input e2e: host resize+grayscale (cv2/native), 1.7x fewer
    # uploaded bytes — the production path when host->device bandwidth is
    # the bottleneck (it is ~100 MB/s on this tunneled dev backend, vs
    # multiple GB/s on directly-attached hosts)
    from chessvision_tpu.engine import pack_inputs

    comp, gray = pack_inputs(batch)
    out = engine.run_packed(comp, gray)
    np.asarray(out["found"])  # force completion (block_until_ready is a
    # no-op on this remote backend)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        comp, gray = pack_inputs(batch)
        out = engine.run_packed(comp, gray)
        np.asarray(out["found"])
    packed_elapsed = time.perf_counter() - t0
    packed_boards_per_sec = args.batch_size * args.iters / packed_elapsed

    # raw host->device bandwidth for context
    import jax.numpy as jnp2

    probe = batch[: max(1, args.batch_size // 4)]
    t0 = time.perf_counter()
    d = jnp2.asarray(probe)
    float(d.reshape(-1)[:8].astype(jnp2.float32).sum())
    upload_mb_s = probe.nbytes / 1e6 / (time.perf_counter() - t0)

    # headline e2e = the better of the two legitimate host-image→FEN paths
    # (raw-frame upload vs packed host-prep); both include all host work
    # and host→device transfer every iteration
    best_e2e = max(boards_per_sec, packed_boards_per_sec)
    result = {
        "metric": "boards_per_sec_e2e",
        "value": round(best_e2e, 2),
        "unit": "boards/s",
        "vs_baseline": round(best_e2e / BASELINE_BOARDS_PER_SEC, 3),
        "raw_frame_boards_per_sec": round(boards_per_sec, 2),
        "compute_boards_per_sec": round(compute_boards_per_sec, 2),
        "packed_boards_per_sec": round(packed_boards_per_sec, 2),
        "upload_mb_per_sec": round(upload_mb_s, 1),
        "p50_latency_ms": round(p50_ms, 2),
        "batch_size": args.batch_size,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    # flag when the host link, not TPU compute, bounds the e2e number
    # (this dev environment reaches the chip through a ~35-90 MB/s relay;
    # directly-attached hosts move GB/s and e2e ≈ compute there)
    upload_bound_rate = upload_mb_s / (batch.nbytes / args.batch_size / 1e6)
    if compute_boards_per_sec > 2 * boards_per_sec and upload_bound_rate < compute_boards_per_sec:
        result["note"] = "host->device link-bound: e2e capped near upload_mb_per_sec / frame_size"
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
