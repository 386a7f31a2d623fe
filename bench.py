"""End-to-end benchmark: boards/sec image→FEN on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the 500 boards/sec single-chip target from
BASELINE.json.  Uses trained weights from weights/ when present, random
init otherwise (identical compute graph either way).

Measurement design for this environment's tunneled TPU backend (CLAUDE.md):
the host↔device relay degrades with cumulative transfer volume within a
process, so path ORDER used to decide the recorded ranking.  All e2e paths
are therefore measured ROUND-ROBIN — one iteration of each path per cycle —
so every path sees the same average link health, and a bandwidth probe is
taken before and after the e2e block to quantify the drift.  All program
compilation is warmed with device-created zeros (no host→device traffic).

E2e candidates, each measured as a PIPELINED STREAM (Engine.run_stream,
round 4): host-pack of batch i+1 and its async upload overlap batch i's
device compute, so steady-state throughput is max(pack, upload, compute)
instead of their serialized sum — every stream element is still a full
host-image→FEN pass (host pack, upload, device pipeline, probabilities
D2H, host validation + FEN strings):
  packed  — exact INTER_AREA + fixed-point gray on host; 448 KB/board;
            BIT-IDENTICAL FENs to raw frames.
  yuv444  — full-res luma + full-res chroma diffs + 4-bit G residuals;
            416 KB/board; reconstruction BIT-EXACT (38/38 FEN gate in
            tests/test_engine_packed.py) — headline-eligible.
  yuv420  — subsampled chroma diffs; 288 KB/board; APPROXIMATE (chroma
            blur; 33/38 agreement measured) — reported, never headline.
  raw     — 768 KB/board uint8 frames, all preprocessing on device.
Double-buffering keeps exactly ONE upload in flight (unbounded interleaved
uploads degrade this relay 3×+, measured round 2); a serialized yuv444
probe is recorded alongside so the overlap gain is visible in the JSON.
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
    from chessvision_tpu.engine import pack_inputs, pack_inputs_yuv, pack_inputs_yuv444

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
    np.asarray(engine._packed_program()(zc, zg, thr)["found"])
    zy = jnp.zeros((bsz, 128, 128), jnp.uint8)
    np.asarray(engine._yuv_program()(zg, zy, zy, thr)["found"])
    zy4 = jnp.zeros((bsz, 256, 256), jnp.uint8)
    zy4r = jnp.full((bsz, 256, 128), 0x88, jnp.uint8)  # zero residuals
    np.asarray(engine._yuv444_program()(zg, zy4, zy4, zy4r, thr)["found"])
    zr = jnp.zeros((bsz, 512, 512, 3), jnp.uint8)
    np.asarray(engine._jitted_closed(zr, thr)["found"])
    z1 = jnp.zeros((1, 512, 512, 3), jnp.uint8)
    np.asarray(engine._jitted_closed(z1, thr)["found"])
    np.asarray(engine._jitted_lite(z1, thr)["found"])
    del zc, zg, zy, zy4, zy4r, zr, z1

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

    def _link_probe() -> float:
        """MB/s of a small fresh upload (cheap: bsz/8 boards)."""
        probe = batch[: max(1, bsz // 8)]
        t0 = time.perf_counter()
        d = jnp.asarray(probe)
        float(d.reshape(-1)[:8].astype(jnp.float32).sum())
        return probe.nbytes / 1e6 / (time.perf_counter() - t0)

    # ---- B=1 p50 latency FIRST (cleanest link), full and lite ALTERNATING
    # so both see the same link health.  The lite path is what serving uses
    # (no board/mask/logits D2H) — record both (round-2 review item). ----
    single = batch[:1]
    engine.process_batch(single)
    engine.process_batch(single, lite=True)
    lat_full, lat_lite = [], []
    for _ in range(7):
        t = time.perf_counter()
        engine.process_batch(single)
        lat_full.append(time.perf_counter() - t)
        t = time.perf_counter()
        engine.process_batch(single, lite=True)
        lat_lite.append(time.perf_counter() - t)
    p50_ms = float(np.median(lat_full) * 1000)
    p50_lite_ms = float(np.median(lat_lite) * 1000)

    # ---- e2e paths, ROUND-ROBIN over pipelined streams: one stream of
    # each path per cycle so the relay's within-process degradation hits
    # every path equally and the recorded ranking tracks bytes, not
    # measurement order.  Each stream element is one full image→FEN batch;
    # Engine.run_stream overlaps host pack + upload of batch i+1 with
    # batch i's device compute (exactly one upload in flight). ----
    fens: list = []

    paths = {
        "packed": ("packed", lambda: pack_inputs(batch)),
        "yuv444": ("yuv444", lambda: pack_inputs_yuv444(batch)),
        "yuv420": ("yuv", lambda: pack_inputs_yuv(batch)),
        "raw_frame": ("raw", lambda: batch),
    }
    kb_per_board = {
        "packed": sum(a.nbytes for a in pack_inputs(batch[:1])) / 1024,
        "yuv444": sum(a.nbytes for a in pack_inputs_yuv444(batch[:1])) / 1024,
        "yuv420": sum(a.nbytes for a in pack_inputs_yuv(batch[:1])) / 1024,
        "raw_frame": batch[:1].nbytes / 1024,
    }

    def _stream_once(kind: str, pack: "callable", n_batches: int) -> float:
        """One pipelined stream of n_batches full image→FEN passes; returns
        elapsed seconds (FEN assembly forces the D2H sync per element)."""
        nonlocal fens
        gen = (pack() for _ in range(n_batches))
        t0 = time.perf_counter()
        for out in engine.run_stream(gen, kind=kind):
            fens = _assemble_fens(out, square_names)
        return time.perf_counter() - t0

    cycles = 2 if args.iters >= 2 else 1
    stream_len = max(1, args.iters // cycles)
    link_before = _link_probe()
    rates: dict[str, list[float]] = {k: [] for k in paths}
    for _ in range(cycles):
        for name, (kind, pack) in paths.items():
            elapsed = _stream_once(kind, pack, stream_len)
            rates[name].append(stream_len * bsz / elapsed)
    # serialized yuv444 probe (pack → upload → compute in sequence) so the
    # stream-overlap gain is visible in the record
    t0 = time.perf_counter()
    y, cb, cr, gres = pack_inputs_yuv444(batch)
    _assemble_fens(engine.run_yuv444(y, cb, cr, gres), square_names)
    serialized_yuv444 = bsz / (time.perf_counter() - t0)
    link_after = _link_probe()
    boards_per_sec = {k: float(np.median(v)) for k, v in rates.items()}
    n_found = sum(1 for f in fens if f)

    # ---- compute-only (device-resident input) ----
    # Measured at 8x the e2e batch: per-dispatch overhead on this backend
    # is ~30 ms, so larger batches amortize it (849 -> 968 -> 1003 boards/s
    # going 128 -> 512 -> 1024 on v5e; 1024 fits HBM with the bf16 UNet and
    # sequentially-scheduled arbitrate classifier passes); input is tiled
    # on DEVICE so no extra link traffic.  If a future program change makes
    # the big batch exceed HBM again, fall back by halves instead of dying
    # — the driver runs this unattended.
    cbsz_attempted = bsz if args.quick else bsz * 8
    cbsz = cbsz_attempted
    compute_boards_per_sec = None
    compute_err = None
    while True:
        try:
            dev_batch = jnp.tile(jnp.asarray(batch), (max(1, cbsz // bsz), 1, 1, 1))[:cbsz]
            np.asarray(engine._jitted_closed(dev_batch, thr)["found"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = engine._jitted_closed(dev_batch, thr)
                np.asarray(out["found"])
            compute_boards_per_sec = cbsz * args.iters / (time.perf_counter() - t0)
            break
        except Exception as e:  # noqa: BLE001 — driver runs this unattended
            # A failed big-batch execution can poison the relay backend's
            # HBM for the rest of the process (measured round 4), so the
            # halving fallback is best-effort; on total failure the e2e
            # numbers above still go out on the required JSON line.
            # Only a genuine OOM justifies halving — a transient relay
            # error mid-timing must not silently shrink the measured batch
            # and misattribute the cause (advisor r4).
            is_oom = "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e)
            if not is_oom or cbsz <= bsz:
                compute_err = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"compute phase failed: {compute_err}", file=sys.stderr)
                break
            cbsz //= 2
            print(f"compute batch OOM, retrying at {cbsz}", file=sys.stderr)

    # headline e2e = best EXACT host-image→FEN path (packed, yuv444 and
    # raw are all bit-identical).  The approximate yuv420 mode never sets
    # the headline.
    best_e2e = max(boards_per_sec[k] for k in ("packed", "yuv444", "raw_frame"))
    # round-comparable signals (the raw e2e headline tracks relay weather,
    # not code — r4 verdict): e2e normalized per MB/s of the SAME-RUN link
    # probe, and the projection at compute bound (a directly-attached GB/s
    # multi-core host pipelines pack/upload under compute, so steady-state
    # e2e ≈ the compute rate there)
    link_mean = (link_before + link_after) / 2.0
    per_mbps = best_e2e / link_mean if link_mean > 0 else None
    result = {
        "metric": "boards_per_sec_e2e",
        "value": round(best_e2e, 2),
        "unit": "boards/s",
        "vs_baseline": round(best_e2e / BASELINE_BOARDS_PER_SEC, 3),
        "paths_boards_per_sec": {k: round(v, 2) for k, v in boards_per_sec.items()},
        "paths_kb_per_board": {k: round(v, 1) for k, v in kb_per_board.items()},
        "e2e_mode": "streamed",
        "stream_batches_per_cycle": stream_len,
        "serialized_yuv444_boards_per_sec": round(serialized_yuv444, 2),
        "compute_boards_per_sec": (
            round(compute_boards_per_sec, 2) if compute_boards_per_sec is not None else None
        ),
        "compute_batch_size_attempted": cbsz_attempted,
        "compute_batch_size": cbsz if compute_boards_per_sec is not None else None,
        "boards_per_sec_per_mbps": (
            round(per_mbps, 3) if per_mbps is not None else None
        ),
        "e2e_projected_at_compute_bound": (
            round(compute_boards_per_sec, 2) if compute_boards_per_sec is not None else None
        ),
        "link_mb_per_sec_before_e2e": round(link_before, 1),
        "link_mb_per_sec_after_e2e": round(link_after, 1),
        "p50_latency_ms": round(p50_ms, 2),
        "p50_latency_lite_ms": round(p50_lite_ms, 2),
        "batch_size": bsz,
        "boards_found_last_batch": n_found,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    # flag when the host link, not TPU compute, bounds the e2e number
    # (this dev environment reaches the chip through a ~35-90 MB/s relay;
    # directly-attached hosts move GB/s and e2e ≈ compute there)
    if compute_err:
        result["compute_error"] = compute_err
    if compute_boards_per_sec is not None and compute_boards_per_sec > 2 * best_e2e:
        result["note"] = (
            "host->device link-bound: e2e capped near link_mb_per_sec / "
            "paths_kb_per_board; boards_per_sec_per_mbps = value / mean(link "
            "probes), e2e_projected_at_compute_bound = device compute rate"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
