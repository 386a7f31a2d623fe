"""Engine tests: the fused batched pipeline with stub models for
deterministic geometry/FEN checks, and real (random-init) models for
shape/contract checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chessvision_tpu import constants
from chessvision_tpu.chessboard import fen_to_labels
from chessvision_tpu.engine import Engine, validate_labels_batch

START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


class StubExtractor:
    """Returns fixed segmentation logits regardless of input."""

    def __init__(self, logits_256: np.ndarray):
        self._logits = jnp.asarray(logits_256, jnp.float32)

    def apply(self, variables, x, **kw):
        b = x.shape[0]
        return jnp.broadcast_to(self._logits[None, :, :, None], (b, 256, 256, 1))


class StubClassifier:
    """Returns fixed per-square class logits regardless of input."""

    def __init__(self, logits_64x13: np.ndarray):
        self._logits = jnp.asarray(logits_64x13, jnp.float32)

    def apply(self, variables, x, **kw):
        n = x.shape[0]
        reps = n // 64
        return jnp.tile(self._logits, (reps, 1))


def _quad_logits(quad_pts: np.ndarray) -> np.ndarray:
    """Segmentation logits: +8 inside the quad, -8 outside."""
    import cv2

    mask = np.zeros((256, 256), np.uint8)
    cv2.fillConvexPoly(mask, quad_pts.astype(np.int32), 255)
    return np.where(mask > 0, 8.0, -8.0).astype(np.float32)


def _start_position_logits() -> np.ndarray:
    labels = fen_to_labels(START_FEN)  # FEN order == SQUARE_NAMES_NORMAL order
    out = np.full((64, 13), -5.0, np.float32)
    for i, lab in enumerate(labels):
        out[i, constants.LABEL_INDICES[lab]] = 5.0
    return out


@pytest.fixture(scope="module")
def stub_engine() -> Engine:
    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.float32)
    return Engine(
        StubExtractor(_quad_logits(quad)),
        {},
        StubClassifier(_start_position_logits()),
        {},
    )


def test_engine_end_to_end_fen(stub_engine: Engine) -> None:
    images = np.random.default_rng(0).integers(0, 256, (2, 512, 512, 3), np.uint8)
    result = stub_engine.process_batch(images, threshold=0.5)
    assert result.board_found.all()
    assert result.fens == [START_FEN, START_FEN]
    assert result.original_fens == [START_FEN, START_FEN]
    assert result.board_image.shape == (2, 512, 512)
    assert result.probabilities.shape == (2, 64, 13)
    assert result.quadrangle.shape == (2, 4, 2)
    # quad scaled to original 512-image coords: roughly 2x the mask coords
    assert 40 <= result.quadrangle[0, :, 0].min() <= 80
    assert result.validation_fixes[0] == []


def test_engine_flip_orientation(stub_engine: Engine) -> None:
    images = np.zeros((1, 512, 512, 3), np.uint8)
    result = stub_engine.process_batch(images, threshold=0.5, flip=True)
    # same per-square labels but assigned to flipped square names reverses
    # the position
    want = "/".join(
        "".join(reversed(row)) for row in reversed(START_FEN.split("/"))
    )
    assert result.fens[0] == want


def test_engine_not_found_flag() -> None:
    eng = Engine(
        StubExtractor(np.full((256, 256), -8.0, np.float32)),
        {},
        StubClassifier(_start_position_logits()),
        {},
    )
    images = np.zeros((1, 512, 512, 3), np.uint8)
    result = eng.process_batch(images)
    assert not result.board_found.any()
    assert result.fens == [""]
    assert result.validation_fixes == [[]]


def test_validation_rule_applied() -> None:
    """Pawns predicted on the back ranks get replaced by next-best class."""
    logits = _start_position_logits()
    # corrupt a8 (index 0): make 'P' the top class, rook 'r' second
    logits[0, :] = -5.0
    logits[0, constants.LABEL_INDICES["P"]] = 5.0
    logits[0, constants.LABEL_INDICES["r"]] = 4.0

    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.float32)
    eng = Engine(StubExtractor(_quad_logits(quad)), {}, StubClassifier(logits), {})
    result = eng.process_batch(np.zeros((1, 512, 512, 3), np.uint8))
    assert result.original_fens[0] == "Pnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"
    assert result.fens[0] == START_FEN
    fixes = result.validation_fixes[0]
    assert len(fixes) == 1
    assert fixes[0].square_name == "a8"
    assert fixes[0].original_piece == "P"
    assert fixes[0].corrected_piece == "r"
    assert fixes[0].rule_name == "no_pawns_on_ends"


def test_validate_labels_batch_no_pawn_untouched() -> None:
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 1.0
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert fixes == [[]]
    assert all(l == "f" for l in labels[0])


def test_validate_one_king_per_color_demotes_the_weaker_king() -> None:
    """Two black kings: the lower-probability one falls to its next-best
    non-king class (reference's sketched rule 2, core.py:471-511)."""
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 0.9
    # true king mid-board (square 20), phantom on square 30
    probs[0, 20] = 0.0
    probs[0, 20, constants.LABEL_INDICES["k"]] = 0.8
    probs[0, 30] = 0.0
    probs[0, 30, constants.LABEL_INDICES["k"]] = 0.4
    probs[0, 30, constants.LABEL_INDICES["f"]] = 0.3
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert labels[0][20] == "k"
    assert labels[0][30] == "f"
    king_fixes = [f for f in fixes[0] if f.rule_name == "one_king_per_color"]
    assert len(king_fixes) == 1
    assert king_fixes[0].square_name == constants.SQUARE_NAMES_NORMAL[30]
    assert king_fixes[0].original_piece == "k"
    assert king_fixes[0].corrected_piece == "f"


def test_validate_king_demotion_skips_pawns_on_back_ranks() -> None:
    """A demoted back-rank phantom king must not become a pawn (that would
    reintroduce a rule-1 violation) nor the other color's king."""
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 0.9
    back = next(
        i
        for i, n in enumerate(constants.SQUARE_NAMES_NORMAL)
        if n in constants.INVALID_PAWN_SQUARES
    )
    probs[0, 20] = 0.0
    probs[0, 20, constants.LABEL_INDICES["K"]] = 0.9
    probs[0, back] = 0.0
    probs[0, back, constants.LABEL_INDICES["K"]] = 0.5
    probs[0, back, constants.LABEL_INDICES["p"]] = 0.3  # banned: pawn on back rank
    probs[0, back, constants.LABEL_INDICES["k"]] = 0.25  # banned: still a king
    probs[0, back, constants.LABEL_INDICES["R"]] = 0.2
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert labels[0][back] == "R"
    assert labels[0][20] == "K"


def test_validate_single_kings_untouched() -> None:
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 0.9
    probs[0, 10] = 0.0
    probs[0, 10, constants.LABEL_INDICES["K"]] = 0.6
    probs[0, 50] = 0.0
    probs[0, 50, constants.LABEL_INDICES["k"]] = 0.6
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert fixes == [[]]
    assert labels[0][10] == "K" and labels[0][50] == "k"


def test_validate_missing_king_promoted() -> None:
    """A color with zero kings promotes its most-king-probable square
    (rule 3) — the 76be4f7f failure shape: king misread as queen."""
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 0.9
    # white king present; black king misread as queen on square 12
    probs[0, 20] = 0.0
    probs[0, 20, constants.LABEL_INDICES["K"]] = 0.8
    probs[0, 12] = 0.0
    probs[0, 12, constants.LABEL_INDICES["q"]] = 0.4
    probs[0, 12, constants.LABEL_INDICES["k"]] = 0.3
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert labels[0][12] == "k"
    king_fixes = [f for f in fixes[0] if f.rule_name == "missing_king"]
    assert len(king_fixes) == 1
    assert king_fixes[0].square_name == constants.SQUARE_NAMES_NORMAL[12]
    assert king_fixes[0].original_piece == "q"
    assert king_fixes[0].corrected_piece == "k"


def test_validate_missing_king_floor_blocks_empty_board() -> None:
    """A cleared board (king probs ~0 everywhere) must not grow kings."""
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 0.99
    probs[0, :, constants.LABEL_INDICES["k"]] = 0.005
    probs[0, :, constants.LABEL_INDICES["K"]] = 0.005
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert fixes == [[]]
    assert all(l == "f" for l in labels[0])


def test_validate_missing_king_never_displaces_other_king() -> None:
    """If the best k-candidate square holds the white king, promotion
    goes to the next-best candidate instead."""
    probs = np.zeros((1, 64, 13), np.float32)
    probs[0, :, constants.LABEL_INDICES["f"]] = 0.9
    probs[0, 20] = 0.0
    probs[0, 20, constants.LABEL_INDICES["K"]] = 0.6
    probs[0, 20, constants.LABEL_INDICES["k"]] = 0.3  # best k prob, but K square
    probs[0, 33] = 0.0
    probs[0, 33, constants.LABEL_INDICES["b"]] = 0.5
    probs[0, 33, constants.LABEL_INDICES["k"]] = 0.2
    labels, fixes = validate_labels_batch(probs, constants.SQUARE_NAMES_NORMAL)
    assert labels[0][20] == "K"
    assert labels[0][33] == "k"


def test_engine_with_real_models_shapes() -> None:
    """Random-init real models through the full fused pipeline: contract
    check (shapes/dtypes/finiteness), small widths for CPU speed."""
    from chessvision_tpu import models

    ex, _ = models.create_extractor("yolo", dtype=jnp.float32, width=8)
    cl, cl_spec = models.create_classifier("yolo", dtype=jnp.float32, width=8)
    key = jax.random.PRNGKey(0)
    ex_vars = ex.init(key, jnp.zeros((1, 256, 256, 3)))
    cl_vars = cl.init(key, jnp.zeros((1, 64, 64, 1)))
    eng = Engine(ex, ex_vars, cl, cl_vars, classifier_outputs_probabilities=cl_spec.outputs_probabilities)
    images = np.random.default_rng(1).integers(0, 256, (2, 512, 512, 3), np.uint8)
    result = eng.process_batch(images)
    assert result.logits.shape == (2, 256, 256)
    assert result.binary_mask.dtype == np.uint8
    assert result.probabilities.shape == (2, 64, 13)
    assert np.isfinite(result.probabilities).all()
    assert result.board_found.dtype == bool


def test_engine_sharded_over_mesh() -> None:
    """The fused pipeline sharded over the 8-device CPU mesh, with batch
    padding for non-divisible sizes."""
    from chessvision_tpu.parallel import create_mesh

    mesh = create_mesh()
    assert mesh.size == 8
    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.float32)
    eng = Engine(
        StubExtractor(_quad_logits(quad)),
        {},
        StubClassifier(_start_position_logits()),
        {},
        mesh=mesh,
    )
    images = np.zeros((5, 512, 512, 3), np.uint8)  # 5 not divisible by 8
    result = eng.process_batch(images)
    assert len(result.fens) == 5
    assert result.fens == [START_FEN] * 5


def test_engine_non_512_frames(stub_engine: Engine) -> None:
    """Frames other than 512x512 must flow through the whole pipeline:
    the seg input is resized from the full frame and the quadrangle is
    scaled by orig_height/256 (reference core.py:413-417 semantics —
    guards the (width, height) vs (height, width) conventions fixed in
    round 2)."""
    for hw in ((1024, 1024), (768, 768)):
        images = np.random.default_rng(1).integers(0, 256, (2, *hw, 3), np.uint8)
        res = stub_engine.process_batch(images)
        assert list(res.board_found) == [True, True]
        assert res.board_image.shape == (2, 512, 512)
        # stub quad spans [28, 228] in mask space; scaled by h/256
        sf = hw[0] / 256.0
        assert res.quadrangle.max() <= 256.0 * sf
        assert res.quadrangle.max() > 200.0 * sf
        assert all(f == res.fens[0] for f in res.fens)
        assert res.fens[0]  # non-empty FEN


def test_arbitrate_chunked_matches_unchunked(monkeypatch) -> None:
    """Batches above _ARBITRATE_CHUNK run the arbitrate tail (resample +
    two classifier passes + soft blend) under lax.map so live stem
    activations are bounded (the unchunked 2-pass program OOMed a 16 GB
    v5e at B=1024).  The chunked program must agree with the unchunked
    one — same boards, same corrections, same blend — including the
    lax.map remainder path (5 = 2+2+1 at chunk 2)."""
    import chessvision_tpu.engine as engine_mod
    from chessvision_tpu import models

    ex, _ = models.create_extractor("yolo", dtype=jnp.float32, width=8)
    cl, cl_spec = models.create_classifier("yolo", dtype=jnp.float32, width=8)
    key = jax.random.PRNGKey(0)
    ex_vars = ex.init(key, jnp.zeros((1, 256, 256, 3)))
    cl_vars = cl.init(key, jnp.zeros((1, 64, 64, 1)))
    images = np.random.default_rng(3).integers(0, 256, (5, 512, 512, 3), np.uint8)

    def run() -> object:
        eng = Engine(
            ex, ex_vars, cl, cl_vars,
            classifier_outputs_probabilities=cl_spec.outputs_probabilities,
        )
        return eng.process_batch(images)

    monkeypatch.setattr(engine_mod, "_ARBITRATE_CHUNK", 64)
    ref = run()  # B=5 <= 64: unchunked tail
    monkeypatch.setattr(engine_mod, "_ARBITRATE_CHUNK", 2)
    got = run()  # chunked: 2 + 2 + remainder 1
    np.testing.assert_allclose(got.probabilities, ref.probabilities, atol=1e-5)
    np.testing.assert_allclose(
        got.quadrangle.astype(np.float64), ref.quadrangle.astype(np.float64), atol=1e-3
    )
    np.testing.assert_array_equal(got.board_found, ref.board_found)


def test_arbitrate_chunk_scales_with_mesh(monkeypatch) -> None:
    """The arbitrate HBM bound is PER DEVICE: on a batch-sharded mesh the
    chunk threshold must scale by mesh size, or B=1024 on 8 chips (128
    boards/device — fine for HBM) would chunk into a lax.scan that
    serializes the data-parallel tail and forces resharding (advisor r4
    medium).  Correctness of the chunked tail ON a cross-process mesh is
    executed by tests/test_mesh_distributed.py's arbitrate parity test."""
    import chessvision_tpu.engine as engine_mod
    from chessvision_tpu import models
    from chessvision_tpu.parallel.mesh import create_mesh

    cl, cl_spec = models.create_classifier("yolo", dtype=jnp.float32, width=8)
    cl_vars = cl.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))
    ex, _ = models.create_extractor("yolo", dtype=jnp.float32, width=8)
    ex_vars = ex.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))

    def make(mesh=None, **kw) -> Engine:
        return Engine(
            ex, ex_vars, cl, cl_vars,
            classifier_outputs_probabilities=cl_spec.outputs_probabilities,
            mesh=mesh, **kw,
        )

    assert make()._arbitrate_chunk == engine_mod._ARBITRATE_CHUNK
    mesh = create_mesh()
    assert make(mesh=mesh)._arbitrate_chunk == engine_mod._ARBITRATE_CHUNK * mesh.size
    # explicit arg and env override take precedence (for hardware sweeps)
    assert make(mesh=mesh, arbitrate_chunk=2)._arbitrate_chunk == 2
    monkeypatch.setenv("CVTPU_ARBITRATE_CHUNK", "256")
    assert make(mesh=mesh)._arbitrate_chunk == 256 * mesh.size
    assert make()._arbitrate_chunk == 256
