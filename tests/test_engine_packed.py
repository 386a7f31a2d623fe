"""Packed-input engine path: parity with the all-device pipeline."""

import numpy as np

from chessvision_tpu.engine import Engine, pack_inputs
from tests.test_engine import StubClassifier, StubExtractor, _quad_logits, _start_position_logits

START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


def test_pack_inputs_shapes() -> None:
    imgs = np.random.default_rng(0).integers(0, 256, (3, 512, 512, 3), np.uint8)
    comp, gray = pack_inputs(imgs)
    assert comp.shape == (3, 256, 256, 3) and comp.dtype == np.uint8
    assert gray.shape == (3, 512, 512) and gray.dtype == np.uint8
    # packed payload is ~1.7x smaller than raw frames
    assert (comp.nbytes + gray.nbytes) < 0.65 * imgs.nbytes


def test_run_packed_matches_process_batch() -> None:
    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.float32)
    eng = Engine(
        StubExtractor(_quad_logits(quad)), {}, StubClassifier(_start_position_logits()), {}
    )
    imgs = np.random.default_rng(1).integers(0, 256, (2, 512, 512, 3), np.uint8)

    full = eng.process_batch(imgs)
    comp, gray = pack_inputs(imgs)
    packed = {k: np.asarray(v) for k, v in eng.run_packed(comp, gray).items()}

    assert packed["found"].all()
    np.testing.assert_allclose(packed["quadrangle"], full.quadrangle, atol=1e-3)
    # boards differ only by grayscale rounding order (±1 level)
    diff = np.abs(packed["board_image"].astype(int) - full.board_image.astype(int))
    assert diff.mean() < 1.0, diff.mean()
    np.testing.assert_allclose(packed["probabilities"], full.probabilities, atol=1e-5)
