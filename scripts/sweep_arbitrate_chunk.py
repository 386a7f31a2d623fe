"""Arbitrate-tail chunk-size sweep: device-resident compute throughput of
the SHIPPING engine program at a given batch and chunk.

The round-4 bench measured the chunked arbitrate program at 829.7 boards/s
vs 1003.7 for the retired single-pass program at B=1024 — a 17% cost of
which FLOPs (the second classifier pass + resample matmuls) only justify
~13%.  This script measures where the rest goes: one (batch, chunk,
refine-mode) config per PROCESS invocation — a failed big-batch execution
poisons the relay backend's HBM for the rest of the process (measured
round 4), so sweeping inside one process would corrupt every config after
the first OOM.  Drive it like:

    for c in 128 256 512 1024; do
      timeout 900 python scripts/sweep_arbitrate_chunk.py --chunk $c; done
    python scripts/sweep_arbitrate_chunk.py --refine off        # reference
    python scripts/sweep_arbitrate_chunk.py --refine detect     # one pass

Prints one JSON line.  (Reference anchor for the replaced single classify
pass: reference core.py:225-249.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=128, help="arbitrate tail chunk")
    ap.add_argument("--refine", default="arbitrate", choices=["arbitrate", "detect", "off"])
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chessvision_tpu import ChessVision

    cv = ChessVision(lazy_load=False)
    base = cv.engine
    from chessvision_tpu.engine import Engine

    engine = Engine(
        base._extractor,
        base._ex_vars,
        base._classifier,
        base._cl_vars,
        classifier_outputs_probabilities=base._cls_probs_flag,
        refine_grid=args.refine,
        arbitrate_chunk=args.chunk,
    )

    rec: dict = {
        "batch": args.batch,
        "chunk": args.chunk,
        "refine": args.refine,
        "backend": jax.default_backend(),
    }
    thr = jnp.float32(0.5)
    try:
        # device-created input: no host link traffic in the measurement
        dev_batch = jnp.tile(
            jnp.asarray(
                np.random.default_rng(0).integers(0, 256, (128, 512, 512, 3), np.uint8)
            ),
            (max(1, args.batch // 128), 1, 1, 1),
        )[: args.batch]
        t0 = time.perf_counter()
        np.asarray(engine._jitted_closed(dev_batch, thr)["found"])
        rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = engine._jitted_closed(dev_batch, thr)
            np.asarray(out["found"])
        dt = time.perf_counter() - t0
        rec["boards_per_sec"] = round(args.batch * args.iters / dt, 2)
        rec["ms_per_batch"] = round(1000 * dt / args.iters, 2)
    except Exception as e:  # noqa: BLE001 — record OOMs as data points
        rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
