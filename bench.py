"""End-to-end benchmark: boards/sec image→FEN on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 500 boards/sec single-chip target from
BASELINE.json.  Uses trained weights from weights/ when present, random
init otherwise (identical compute graph either way).

Measurement order matters on this environment's tunneled TPU backend: the
host↔device relay degrades with cumulative transfer volume within a
process (CLAUDE.md), so all program compilation is warmed with
device-created zeros (no host→device traffic), and the HEADLINE e2e path
is measured first on the freshest link.  The headline path is the
production ingest pipeline: host pack (exact INTER_AREA + fixed-point
grayscale, 1.7× fewer bytes than raw frames, bit-identical FENs) and host
FEN assembly — every stage of image→FEN is inside the timed loop.  The
4:2:0 YUV mode (2.7× fewer bytes, approximate) is reported separately.
Measurements are synchronous (bounded queue): interleaved async uploads
degrade this relay 3×+; on directly-attached hosts use Engine.run_stream.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_BOARDS_PER_SEC = 500.0


def _assemble_fens(out: dict, square_names) -> list[str]:
    """Host half of image→FEN: validation + FEN strings (timed)."""
    from chessvision_tpu.chessboard import labels_to_fen
    from chessvision_tpu.engine import validate_labels_batch

    probs = np.asarray(out["probabilities"])
    found = np.asarray(out["found"])
    validated, _ = validate_labels_batch(probs, square_names)
    return [
        labels_to_fen(validated[i], square_names) if found[i] else ""
        for i in range(len(found))
    ]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--quick", action="store_true", help="tiny config for CPU smoke runs")
    parser.add_argument("--extractor", default=None, help="extractor model id (default unet)")
    parser.add_argument("--classifier", default=None, help="classifier model id (default resnet18)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.quick:
        args.batch_size, args.iters = 4, 2

    from chessvision_tpu import ChessVision, constants
    from chessvision_tpu.engine import pack_inputs, pack_inputs_yuv

    cv = ChessVision(
        board_extractor_model_id=args.extractor,
        classifier_model_id=args.classifier,
        lazy_load=False,
    )
    engine = cv.engine
    bsz = args.batch_size
    square_names = constants.SQUARE_NAMES_NORMAL

    # ---- compile warmup with device-created zeros: NO host→device bytes ----
    thr = jnp.float32(0.5)
    zc = jnp.zeros((bsz, 256, 256, 3), jnp.uint8)
    zg = jnp.zeros((bsz, 512, 512), jnp.uint8)
    out = engine._packed_program()(zc, zg, thr)
    np.asarray(out["found"])
    zy = jnp.zeros((bsz, 128, 128), jnp.uint8)
    out = engine._yuv_program()(zg, zy, zy, thr)
    np.asarray(out["found"])
    zr = jnp.zeros((bsz, 512, 512, 3), jnp.uint8)
    out = engine._jitted_closed(zr, thr)
    np.asarray(out["found"])
    z1 = jnp.zeros((1, 512, 512, 3), jnp.uint8)
    np.asarray(engine._jitted_closed(z1, thr)["found"])
    del zc, zg, zy, zr, z1, out

    # ---- load real test images, tiled up to the batch size ----
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
        batch = np.stack((images * ((bsz // len(images)) + 1))[:bsz])
    else:
        batch = np.random.default_rng(0).integers(0, 256, (bsz, 512, 512, 3), np.uint8)

    # ---- connection warmup: the relay's first transfer is ~10× slow ----
    np.asarray(jnp.asarray(batch[:4]).reshape(-1)[:8])

    # ---- B=1 p50 latency FIRST: the relay degrades with cumulative
    # in-process transfer volume (CLAUDE.md), so single-image latency is
    # measured on the cleanest link, before the throughput loops ----
    single = batch[:1]
    engine.process_batch(single)
    lat = []
    for _ in range(7):
        t = time.perf_counter()
        engine.process_batch(single)
        lat.append(time.perf_counter() - t)
    p50_ms = float(np.median(lat) * 1000)

    def _timed(run_once, iters: int) -> float:
        """boards/s from the MEDIAN per-iteration wall time (robust to the
        relay's transient stalls); every iteration is a full host-image→FEN
        pass: host pack, host→device upload, device pipeline, probabilities
        D2H, host validation + FEN strings."""
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run_once()
            times.append(time.perf_counter() - t0)
        return bsz / float(np.median(times))

    # All paths below run SYNCHRONOUSLY (bounded queue depth): on this
    # tunneled dev backend, interleaved async uploads degrade the relay 3×+
    # (measured; also the round-1 finding), so the double-buffered
    # run_stream API is NOT used for measurement here — on directly-attached
    # hosts it overlaps upload with compute and is the production mode.

    # ---- HEADLINE candidate (freshest link): packed sync ----
    # Exact INTER_AREA + fixed-point gray on host: 1.7× fewer bytes than
    # raw frames, BIT-IDENTICAL FENs (the raw path chains the same compiled
    # back half).
    fens: list = []

    def _packed_once() -> None:
        nonlocal fens
        comp, gray = pack_inputs(batch)
        fens = _assemble_fens(engine.run_packed(comp, gray), square_names)

    packed_boards_per_sec = _timed(_packed_once, args.iters)
    n_found = sum(1 for f in fens if f)

    # ---- YUV 4:2:0 sync (approximate mode: subsampled chroma diffs; 1.56×
    # fewer bytes again; FENs can deviate on marginal squares — measured
    # 33/38 agreement on data/test, see process_yuv_fn) ----
    def _yuv_once() -> None:
        y, cb, cr = pack_inputs_yuv(batch)
        _assemble_fens(engine.run_yuv(y, cb, cr), square_names)

    yuv_boards_per_sec = _timed(_yuv_once, max(2, args.iters // 2))

    # ---- raw-frame sync path (for the record) ----
    def _raw_once() -> None:
        _assemble_fens(engine.run_device(batch), square_names)

    raw_boards_per_sec = _timed(_raw_once, max(2, args.iters // 2))

    # ---- compute-only (device-resident input) ----
    # Measured at 4x the e2e batch: per-dispatch overhead on this backend
    # is ~30 ms, so larger batches amortize it (849 -> 970 boards/s going
    # 128 -> 512 on v5e); input is tiled on DEVICE so no extra link traffic.
    cbsz = bsz if args.quick else bsz * 4
    dev_batch = jnp.tile(jnp.asarray(batch), (cbsz // bsz, 1, 1, 1))
    np.asarray(engine._jitted_closed(dev_batch, thr)["found"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = engine._jitted_closed(dev_batch, thr)
        np.asarray(out["found"])
    compute_elapsed = time.perf_counter() - t0
    compute_boards_per_sec = cbsz * args.iters / compute_elapsed

    # ---- raw host→device bandwidth probe (last: costs link budget) ----
    probe = batch[: max(1, bsz // 8)]
    t0 = time.perf_counter()
    d = jnp.asarray(probe)
    float(d.reshape(-1)[:8].astype(jnp.float32).sum())
    upload_mb_s = probe.nbytes / 1e6 / (time.perf_counter() - t0)

    # headline e2e = best EXACT host-image→FEN path (bit-identical outputs
    # to the raw path); every candidate includes host prep, host→device
    # transfer and FEN assembly per iteration.  The approximate YUV mode is
    # reported separately and never sets the headline.
    best_e2e = max(packed_boards_per_sec, raw_boards_per_sec)
    packed_bytes = sum(a.nbytes for a in pack_inputs(batch[:1]))
    result = {
        "metric": "boards_per_sec_e2e",
        "value": round(best_e2e, 2),
        "unit": "boards/s",
        "vs_baseline": round(best_e2e / BASELINE_BOARDS_PER_SEC, 3),
        "packed_boards_per_sec": round(packed_boards_per_sec, 2),
        "yuv_boards_per_sec": round(yuv_boards_per_sec, 2),
        "raw_frame_boards_per_sec": round(raw_boards_per_sec, 2),
        "compute_boards_per_sec": round(compute_boards_per_sec, 2),
        "compute_batch_size": cbsz,
        "upload_mb_per_sec": round(upload_mb_s, 1),
        "p50_latency_ms": round(p50_ms, 2),
        "batch_size": bsz,
        "boards_found_last_batch": n_found,
        "packed_kb_per_board": round(packed_bytes / 1024, 1),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    # flag when the host link, not TPU compute, bounds the e2e number
    # (this dev environment reaches the chip through a ~35-90 MB/s relay;
    # directly-attached hosts move GB/s and e2e ≈ compute there)
    if compute_boards_per_sec > 2 * best_e2e:
        result["note"] = "host->device link-bound: e2e capped near upload_mb_per_sec / packed_kb_per_board"
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
