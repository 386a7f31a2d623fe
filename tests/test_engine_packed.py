"""Packed-input engine paths: parity with the all-device pipeline."""

from pathlib import Path

import numpy as np
import pytest

from chessvision_tpu.engine import (
    Engine,
    pack_inputs,
    pack_inputs_yuv,
    pack_inputs_yuv444,
)
from tests.test_engine import StubClassifier, StubExtractor, _quad_logits, _start_position_logits

START_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR"


def _stub_engine() -> Engine:
    quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.float32)
    return Engine(
        StubExtractor(_quad_logits(quad)), {}, StubClassifier(_start_position_logits()), {}
    )


def test_pack_inputs_shapes() -> None:
    imgs = np.random.default_rng(0).integers(0, 256, (3, 512, 512, 3), np.uint8)
    comp, gray = pack_inputs(imgs)
    assert comp.shape == (3, 256, 256, 3) and comp.dtype == np.uint8
    assert gray.shape == (3, 512, 512) and gray.dtype == np.uint8
    # packed payload is ~1.7x smaller than raw frames
    assert (comp.nbytes + gray.nbytes) < 0.65 * imgs.nbytes


def test_pack_inputs_yuv_shapes() -> None:
    imgs = np.random.default_rng(0).integers(0, 256, (3, 512, 512, 3), np.uint8)
    y, cb, cr = pack_inputs_yuv(imgs)
    assert y.shape == (3, 512, 512) and y.dtype == np.uint8
    assert cb.shape == (3, 128, 128) and cb.dtype == np.uint8
    assert cr.shape == (3, 128, 128) and cr.dtype == np.uint8
    # 4:2:0 payload is ~2.7x smaller than raw frames
    assert (y.nbytes + cb.nbytes + cr.nbytes) < 0.40 * imgs.nbytes


def test_run_packed_is_bit_identical_to_process_batch() -> None:
    """The raw-frame path chains the SAME compiled back half the packed
    path uses, so outputs must be bit-identical — the bench's headline
    packed path provably changes nothing."""
    eng = _stub_engine()
    imgs = np.random.default_rng(1).integers(0, 256, (2, 512, 512, 3), np.uint8)

    full = eng.process_batch(imgs)
    comp, gray = pack_inputs(imgs)
    packed = {k: np.asarray(v) for k, v in eng.run_packed(comp, gray).items()}

    assert packed["found"].all()
    np.testing.assert_array_equal(packed["quadrangle"], full.quadrangle)
    np.testing.assert_array_equal(packed["board_image"], full.board_image)
    np.testing.assert_array_equal(packed["probabilities"], full.probabilities)


def test_run_yuv_reconstruction_close() -> None:
    """YUV 4:2:0 is the documented APPROXIMATE mode: same geometry from the
    exact luma plane; classifier probabilities may differ slightly through
    the chroma-blurred segmentation input (33/38 FEN agreement measured on
    data/test — stub models here give deterministic geometry)."""
    eng = _stub_engine()
    imgs = np.random.default_rng(2).integers(0, 256, (2, 512, 512, 3), np.uint8)

    full = eng.process_batch(imgs)
    y, cb, cr = pack_inputs_yuv(imgs)
    out = {k: np.asarray(v) for k, v in eng.run_yuv(y, cb, cr).items()}

    assert out["found"].all()
    # the warp half uses the exact full-res luma: geometry identical
    np.testing.assert_array_equal(out["quadrangle"], full.quadrangle)
    np.testing.assert_array_equal(out["board_image"], full.board_image)


def test_yuv_comp_reconstruction_accuracy() -> None:
    """The device-reconstructed segmentation input must track the exact
    INTER_AREA comp closely (chroma-difference 4:2:0: full luma detail in
    every channel; only chroma edges blur)."""
    import cv2
    import jax.numpy as jnp

    from chessvision_tpu import constants
    from chessvision_tpu.ops import resize

    rng = np.random.default_rng(3)
    # piecewise-smooth color image (natural-image-like chroma)
    base = rng.integers(0, 256, (4, 4, 3), np.uint8)
    img = cv2.resize(base, (512, 512), interpolation=cv2.INTER_LINEAR)
    imgs = img[None]

    comp_exact, _ = pack_inputs(imgs)
    y, cb, cr = pack_inputs_yuv(imgs)

    # replicate the device reconstruction (process_yuv_fn)
    y256 = np.asarray(resize(jnp.asarray(y, jnp.float32), constants.INPUT_SIZE))
    cb256 = np.asarray(resize(jnp.asarray(cb), constants.INPUT_SIZE)) - 128.0
    cr256 = np.asarray(resize(jnp.asarray(cr), constants.INPUT_SIZE)) - 128.0
    b = y256 + cb256
    r = y256 + cr256
    g = (y256 - (9798 / 32768) * r - (3735 / 32768) * b) / (19235 / 32768)
    rec = np.clip(np.floor(np.stack([b, g, r], -1) + 0.5), 0, 255)

    err = np.abs(rec - comp_exact.astype(np.float64))
    assert err.mean() < 1.5, err.mean()
    assert np.percentile(err, 99) <= 6.0, np.percentile(err, 99)


def test_pack_inputs_yuv444_shapes() -> None:
    imgs = np.random.default_rng(0).integers(0, 256, (3, 512, 512, 3), np.uint8)
    y, cb, cr, gres = pack_inputs_yuv444(imgs)
    assert y.shape == (3, 512, 512) and y.dtype == np.uint8
    assert cb.shape == (3, 256, 256) and cb.dtype == np.uint8
    assert cr.shape == (3, 256, 256) and cr.dtype == np.uint8
    assert gres.shape == (3, 256, 128) and gres.dtype == np.uint8
    # 416 KB/board: 1.85x smaller than raw frames, 7% under packed
    comp, gray = pack_inputs(imgs)
    total = y.nbytes + cb.nbytes + cr.nbytes + gres.nbytes
    assert total == 3 * 416 * 1024
    assert total < 0.93 * (comp.nbytes + gray.nbytes)


def test_yuv444_comp_reconstruction_bit_exact() -> None:
    """The bit-exact claim, checked end to end across the codec: host
    ``pack_inputs_yuv444`` → DEVICE ``reconstruct_comp_yuv444`` (the same
    jitted integer function the engine program calls) must reproduce the
    exact INTER_AREA comp.  Exact on a natural-image-like frame; on
    worst-case random chroma, exact wherever the int8 chroma diffs and
    int4 G residuals fit (heavily-clipped pixels excepted)."""
    import cv2
    import jax

    from chessvision_tpu.engine import reconstruct_comp_yuv444

    rng = np.random.default_rng(3)
    # moderate saturation (chroma diffs stay inside int8, like board photos)
    base = rng.integers(80, 176, (4, 4, 3), np.uint8)
    smooth = cv2.resize(base, (512, 512), interpolation=cv2.INTER_LINEAR)
    noisy = rng.integers(0, 256, (512, 512, 3), np.uint8)  # worst-case chroma
    imgs = np.stack([smooth, noisy])

    comp_exact, _ = pack_inputs(imgs)
    y, cb, cr, gres = pack_inputs_yuv444(imgs)
    rec = np.asarray(jax.jit(reconstruct_comp_yuv444)(y, cb, cr, gres))

    ce = comp_exact.astype(np.float32)
    e = np.stack([gres & 15, (gres >> 4) & 15], axis=-1).reshape(2, 256, 256)
    unclipped = (cb > 0) & (cb < 255) & (cr > 0) & (cr < 255)
    resid_fit = (e > 0) & (e < 15)
    # B/R bit-exact wherever the diff fit int8; G wherever its residual
    # fit int4 (everywhere the chroma didn't clip, and almost everywhere
    # it did)
    np.testing.assert_array_equal(rec[..., 0][unclipped], ce[..., 0][unclipped])
    np.testing.assert_array_equal(rec[..., 2][unclipped], ce[..., 2][unclipped])
    np.testing.assert_array_equal(rec[..., 1][resid_fit], ce[..., 1][resid_fit])
    np.testing.assert_array_equal(rec[..., 1][unclipped], ce[..., 1][unclipped])
    # the smooth natural-image frame reconstructs fully bit-exact
    assert unclipped[0].all()
    np.testing.assert_array_equal(rec[0], ce[0])


def test_run_yuv444_bit_identical_to_process_batch() -> None:
    """The bit-exact reconstruction chains the same compiled back half, so
    the ENTIRE output must match the raw-frame path bit for bit (natural
    images: chroma diffs don't clip)."""
    import cv2

    eng = _stub_engine()
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (8, 8, 3), np.uint8)
    imgs = np.stack(
        [
            cv2.resize(base, (512, 512), interpolation=cv2.INTER_LINEAR),
            cv2.resize(base[::-1], (512, 512), interpolation=cv2.INTER_LINEAR),
        ]
    )

    full = eng.process_batch(imgs)
    y, cb, cr, gres = pack_inputs_yuv444(imgs)
    out = {k: np.asarray(v) for k, v in eng.run_yuv444(y, cb, cr, gres).items()}

    assert out["found"].all()
    np.testing.assert_array_equal(out["quadrangle"], full.quadrangle)
    np.testing.assert_array_equal(out["board_image"], full.board_image)
    np.testing.assert_array_equal(out["probabilities"], full.probabilities)
    np.testing.assert_array_equal(out["logits"], full.logits)


@pytest.mark.slow
def test_yuv444_fen_agreement_on_test_set() -> None:
    """The bit-exact minimum-bytes mode on the real test set with the real
    promoted weights: 38/38 — every output FEN identical to the exact
    packed path (the residual-free form managed only 32/38; the 4:2:0
    mode 33/38)."""
    import cv2

    from chessvision_tpu import ChessVision, constants
    from chessvision_tpu.chessboard import labels_to_fen
    from chessvision_tpu.engine import validate_labels_batch

    test_root = Path(constants.DATA_ROOT) / "test"
    paths = sorted(test_root.glob("*/raw/*.JPG"))
    if not paths or not Path("weights/best_classifier.npz").exists():
        pytest.skip("needs data/test and promoted weights")
    imgs = np.stack([cv2.imread(str(p)) for p in paths])
    engine = ChessVision(lazy_load=False).engine

    exact = engine.process_batch(imgs)
    y, cb, cr, gres = pack_inputs_yuv444(imgs)
    out = engine.run_yuv444(y, cb, cr, gres)

    probs = np.asarray(out["probabilities"])
    found = np.asarray(out["found"])
    names = constants.SQUARE_NAMES_NORMAL
    validated, _ = validate_labels_batch(probs, names)
    fens = [
        labels_to_fen(validated[i], names) if found[i] else "" for i in range(len(found))
    ]
    assert list(found) == list(exact.board_found)
    disagree = [
        (a, b) for a, b in zip(fens, exact.fens) if a != b
    ]
    assert not disagree, f"{len(disagree)}/{len(paths)} FENs disagree: {disagree[:3]}"


@pytest.mark.slow
def test_yuv_fen_agreement_on_test_set() -> None:
    """The approximate YUV mode must keep high FEN agreement with the exact
    packed path on data/test using the real promoted weights (measured
    33/38 at round 2; gate at >=30/38 found-and-FEN agreement so chroma
    reconstruction changes cannot silently degrade the mode)."""
    import cv2

    from chessvision_tpu import ChessVision, constants

    test_root = Path(constants.DATA_ROOT) / "test"
    paths = sorted(test_root.glob("*/raw/*.JPG"))
    if not paths or not Path("weights/best_classifier.npz").exists():
        pytest.skip("needs data/test and promoted weights")
    imgs = np.stack([cv2.imread(str(p)) for p in paths])
    engine = ChessVision(lazy_load=False).engine

    exact = engine.process_batch(imgs)
    y, cb, cr = pack_inputs_yuv(imgs)
    out = engine.run_yuv(y, cb, cr)
    from chessvision_tpu.engine import validate_labels_batch
    from chessvision_tpu.chessboard import labels_to_fen

    probs = np.asarray(out["probabilities"])
    found = np.asarray(out["found"])
    names = constants.SQUARE_NAMES_NORMAL
    validated, _ = validate_labels_batch(probs, names)
    yuv_fens = [
        labels_to_fen(validated[i], names) if found[i] else "" for i in range(len(found))
    ]
    assert list(found) == list(exact.board_found)
    agree = sum(1 for a, b in zip(yuv_fens, exact.fens) if a == b)
    assert agree >= int(0.78 * len(paths)), f"only {agree}/{len(paths)} FENs agree"


def test_yuv_pack_size_guards_and_factors() -> None:
    """Review regressions: every yuv444 pack path (native/cv2/numpy) must
    reject non-divisible frames with a host-side ValueError (not garbage
    or an in-jit crash); 4:2:0 must keep accepting non-power-of-two
    integer factors (768²); and yuv444 must stay bit-exact at factor 4
    (1024² — cv2's INTER_AREA is NOT bit-equal there, so the pack must
    not use it)."""
    import jax

    from chessvision_tpu.engine import pack_inputs_yuv444, reconstruct_comp_yuv444

    bad = np.zeros((1, 500, 500, 3), np.uint8)
    with pytest.raises(ValueError):
        pack_inputs_yuv444(bad)
    with pytest.raises(ValueError):
        pack_inputs_yuv(bad)

    # 4:2:0 on 768² (factor 3) — accepted, correct shapes
    imgs768 = np.random.default_rng(5).integers(0, 256, (1, 768, 768, 3), np.uint8)
    y, cb, cr = pack_inputs_yuv(imgs768)
    assert y.shape == (1, 768, 768) and cb.shape == (1, 128, 128)

    # yuv444 at factor 4 (1024²): device reconstruction still bit-exact
    # on unclipped pixels
    import cv2

    base = np.random.default_rng(6).integers(80, 176, (4, 4, 3), np.uint8)
    img = cv2.resize(base, (1024, 1024), interpolation=cv2.INTER_LINEAR)
    comp_exact, _ = pack_inputs(img[None])
    y, cb, cr, gres = pack_inputs_yuv444(img[None])
    rec = np.asarray(jax.jit(reconstruct_comp_yuv444)(y, cb, cr, gres))
    unclipped = (cb > 0) & (cb < 255) & (cr > 0) & (cr < 255)
    assert unclipped.all()
    np.testing.assert_array_equal(rec[0], comp_exact[0].astype(np.float32))
