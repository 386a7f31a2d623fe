"""FEN golden regression: the engine's output FENs over the checked-in
test set are pinned to committed goldens (tests/goldens/fen_goldens.json).

This is the CI tripwire for numerics drift — e.g. a resize-kernel change
moving a marginal quadrangle corner shifts downstream FENs (it happened:
the round-2 integer-factor resize moved accuracy ±2 squares and only a
manual TPU eval caught it).  Reference metric definitions:
scripts/eval/evaluate.py:346-360.

Goldens are the ENGINE's outputs, not ground truth.  A change that
intends to move FENs (new weights, accuracy-improving fix) regenerates
them with ``python scripts/make_fen_goldens.py`` and commits the diff.

The fast gate covers the first 8 images (one B=8 program — this box has
one CPU core; a full pass is slow-marked below).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

GOLDENS_PATH = Path(__file__).parent / "goldens" / "fen_goldens.json"

pytestmark = pytest.mark.skipif(
    not GOLDENS_PATH.exists(), reason="no committed goldens"
)

CHUNK = 8


@pytest.fixture(scope="module")
def goldens() -> dict:
    return json.loads(GOLDENS_PATH.read_text())["results"]


@pytest.fixture(scope="module")
def engine():
    from chessvision_tpu import ChessVision

    return ChessVision(lazy_load=False).engine


def _run_chunk(engine, items) -> dict[str, dict]:
    shapes = {img.shape for img, _, _ in items}
    if len(shapes) > 1:
        # mixed native resolutions can't share one stacked batch — run one
        # sub-chunk per shape (same grouping evaluate.py uses)
        got: dict[str, dict] = {}
        for shape in sorted(shapes):
            got.update(_run_chunk(engine, [it for it in items if it[0].shape == shape]))
        return got
    batch = np.stack([img for img, _, _ in items])
    real = len(items)
    if real < CHUNK:
        batch = np.concatenate([batch, np.repeat(batch[-1:], CHUNK - real, axis=0)])
    res = engine.process_batch(batch)
    return {
        name: {"found": bool(res.board_found[i]), "fen": res.fens[i]}
        for i, (_, name, _) in enumerate(items)
    }


def _assert_match(got: dict[str, dict], goldens: dict) -> None:
    mismatches = []
    for name, rec in got.items():
        want = goldens.get(name)
        assert want is not None, f"{name} missing from goldens — regenerate them"
        if rec != want:
            mismatches.append(f"{name}: got {rec}, golden {want}")
    assert not mismatches, (
        "engine FENs drifted from committed goldens (regenerate with "
        "scripts/make_fen_goldens.py if intentional):\n" + "\n".join(mismatches)
    )


def test_fen_goldens_fast_gate(engine, goldens) -> None:
    from chessvision_tpu.eval.evaluate import get_test_generator

    items = list(get_test_generator())[:CHUNK]
    assert len(items) == CHUNK
    _assert_match(_run_chunk(engine, items), goldens)


@pytest.mark.slow
def test_fen_goldens_full_set(engine, goldens) -> None:
    from chessvision_tpu.eval.evaluate import get_test_generator

    items = list(get_test_generator())
    assert len(items) == len(goldens)
    got: dict[str, dict] = {}
    for start in range(0, len(items), CHUNK):
        got.update(_run_chunk(engine, items[start : start + CHUNK]))
    _assert_match(got, goldens)
