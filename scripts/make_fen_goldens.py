"""Regenerate the committed FEN goldens for the checked-in test set.

The goldens pin the engine's CPU-platform output FENs over all test images
(reference metric definitions: scripts/eval/evaluate.py:346-360); the fast
regression test ``tests/test_fen_goldens.py`` asserts exact match so code-
level numerics drift (e.g. a resize-kernel change moving a marginal corner)
is caught in CI rather than by a manual TPU eval.

Update-on-purpose workflow: when a change INTENDS to move FENs (new
weights, an accuracy-improving kernel fix), re-run

    python scripts/make_fen_goldens.py

review the diff of tests/goldens/fen_goldens.json (each changed FEN is a
deliberate behavior change), and commit it together with the change.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from chessvision_tpu import ChessVision  # noqa: E402
from chessvision_tpu.eval.evaluate import get_test_generator  # noqa: E402

OUT = REPO / "tests" / "goldens" / "fen_goldens.json"


def main() -> None:
    items = list(get_test_generator())
    names = [name for _, name, _ in items]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        # goldens key by bare filename; a same-named image in two test
        # batches would silently overwrite a record — fail loudly instead
        raise SystemExit(
            f"duplicate test image names across batches: {sorted(dupes)} — "
            "extend the golden keying (batch/name) before regenerating"
        )
    cv = ChessVision(lazy_load=False)
    # group by native image shape (evaluate.py does the same — a future
    # mixed-resolution test batch must not crash np.stack), then fixed-size
    # chunks (pad the tail) — ONE compiled program shape per image shape;
    # the single-core CI box can't afford a fresh XLA compile per batch size
    chunk = 8
    shape_groups: dict[tuple, list] = {}
    for it in items:
        shape_groups.setdefault(it[0].shape, []).append(it)
    results: dict[str, dict] = {}
    done = 0
    for group in shape_groups.values():
        for start in range(0, len(group), chunk):
            part = group[start : start + chunk]
            batch = np.stack([img for img, _, _ in part])
            real = len(part)
            if real < chunk:
                batch = np.concatenate([batch, np.repeat(batch[-1:], chunk - real, axis=0)])
            res = cv.engine.process_batch(batch)
            for i, (_, name, _) in enumerate(part):
                results[name] = {"found": bool(res.board_found[i]), "fen": res.fens[i]}
            done += real
            print(f"  {done}/{len(items)}", flush=True)
    goldens = {
        "platform": "cpu",
        "note": "engine output FENs (not ground truth); regenerate with scripts/make_fen_goldens.py",
        "results": results,
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(goldens, indent=1, sort_keys=True) + "\n")
    n_found = sum(r["found"] for r in goldens["results"].values())
    print(f"wrote {OUT} ({len(items)} images, {n_found} extracted)")


if __name__ == "__main__":
    main()
