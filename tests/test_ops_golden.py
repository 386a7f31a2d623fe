"""Golden tests: TPU-native image ops vs OpenCV reference behaviour.

cv2 is a *test-only* dependency used as the oracle; the framework itself
never imports it on the hot path.
"""

import cv2
import numpy as np
import pytest

from chessvision_tpu import ops


@pytest.fixture(scope="module")
def img512(rng_mod: np.random.Generator) -> np.ndarray:
    return rng_mod.integers(0, 256, (512, 512, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def rng_mod() -> np.random.Generator:
    return np.random.default_rng(42)


# --- resize -----------------------------------------------------------------


@pytest.mark.parametrize("src_hw", [(512, 512), (483, 407), (300, 300), (256, 256)])
def test_resize_area_matches_cv2(rng_mod: np.random.Generator, src_hw) -> None:
    img = rng_mod.integers(0, 256, (*src_hw, 3), dtype=np.uint8)
    want = cv2.resize(img, (256, 256), interpolation=cv2.INTER_AREA)
    got = np.asarray(ops.resize(img, (256, 256), round_uint8=True))
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    # cv2 uses fixed-point accumulation; allow ±1 level on a tiny fraction
    if src_hw[0] % 256 == 0 and src_hw[1] % 256 == 0:
        # integer scale factor: bit-exact vs cv2
        assert diff.max() == 0, (diff.max(), diff.mean())
    else:
        # fractional scales take cv2's fixed-point decimation path and
        # differ by ±1 on a minority of pixels
        assert diff.max() <= 2, diff.max()
        assert (diff > 1).mean() < 0.01
        assert diff.mean() < 0.35


def test_resize_identity(rng_mod: np.random.Generator) -> None:
    img = rng_mod.integers(0, 256, (64, 64), dtype=np.uint8)
    got = np.asarray(ops.resize(img, (64, 64), round_uint8=True))
    np.testing.assert_array_equal(got, img)


def test_resize_batched(rng_mod: np.random.Generator) -> None:
    imgs = rng_mod.integers(0, 256, (3, 512, 512, 3), dtype=np.uint8)
    got = np.asarray(ops.resize(imgs, (256, 256), round_uint8=True))
    assert got.shape == (3, 256, 256, 3)
    for i in range(3):
        want = cv2.resize(imgs[i], (256, 256), interpolation=cv2.INTER_AREA)
        assert np.abs(got[i].astype(int) - want.astype(int)).max() <= 2


# --- grayscale / flip / threshold --------------------------------------------


def test_bgr_to_gray_exact(img512: np.ndarray) -> None:
    want = cv2.cvtColor(img512, cv2.COLOR_BGR2GRAY)
    got = np.asarray(ops.bgr_to_gray(img512, exact_u8=True))
    np.testing.assert_array_equal(got, want)


def test_bgr_to_gray_float_close(img512: np.ndarray) -> None:
    want = cv2.cvtColor(img512, cv2.COLOR_BGR2GRAY)
    got = np.asarray(ops.bgr_to_gray(img512))
    assert np.abs(got - want.astype(np.float32)).max() <= 1.0


def test_hflip(img512: np.ndarray) -> None:
    gray = cv2.cvtColor(img512, cv2.COLOR_BGR2GRAY)
    want = cv2.flip(gray, 1)
    got = np.asarray(ops.hflip(gray))
    np.testing.assert_array_equal(got, want)
    # color image: flip width, not channels
    want_c = cv2.flip(img512, 1)
    got_c = np.asarray(ops.hflip(img512))
    np.testing.assert_array_equal(got_c, want_c)


def test_create_binary_mask() -> None:
    probs = np.array([[0.0, 0.5, 0.50001, 1.0]], dtype=np.float32)
    got = np.asarray(ops.create_binary_mask(probs, 0.5))
    # strictly greater than threshold, like the reference
    np.testing.assert_array_equal(got, [[0, 0, 255, 255]])
    assert got.dtype == np.uint8


# --- perspective transform ----------------------------------------------------


def _random_quad(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    # a convex-ish quadrangle: corners of the image, jittered inward
    base = np.array([[40, 30], [w - 50, 45], [w - 35, h - 40], [55, h - 60]], np.float32)
    return base + rng.uniform(-15, 15, base.shape).astype(np.float32)


def test_get_perspective_transform_matches_cv2(rng_mod: np.random.Generator) -> None:
    for _ in range(5):
        src = _random_quad(rng_mod, 512, 512)
        dst = np.array([[0, 0], [512, 0], [512, 512], [0, 512]], np.float32)
        want = cv2.getPerspectiveTransform(src, dst)
        got = np.asarray(ops.get_perspective_transform(src, dst))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_warp_perspective_bilinear_matches_cv2(img512: np.ndarray, rng_mod: np.random.Generator) -> None:
    """The exact-arithmetic gather path vs cv2 (parity mode)."""
    src = _random_quad(rng_mod, 512, 512)
    dst = np.array([[0, 0], [512, 0], [512, 512], [0, 512]], np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    want = cv2.warpPerspective(img512, m, (512, 512))
    got = np.asarray(
        ops.warp_perspective(img512, m.astype(np.float32), (512, 512), round_uint8=True, method="bilinear")
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    # cv2 interpolates with 5-bit fixed-point weights; allow small deviations
    assert diff.mean() < 1.0
    assert (diff > 4).mean() < 0.01


def test_warp_perspective_twopass_close_to_cv2(img512: np.ndarray, rng_mod: np.random.Generator) -> None:
    """The gather-free two-pass TPU path: same geometry, slightly different
    interpolation footprint — must stay within ~1 level on average even on
    white noise (the worst case) and have no large outliers."""
    src = _random_quad(rng_mod, 512, 512)
    dst = np.array([[0, 0], [512, 0], [512, 512], [0, 512]], np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    want = cv2.warpPerspective(img512, m, (512, 512))
    got = np.asarray(
        ops.warp_perspective(img512, m.astype(np.float32), (512, 512), round_uint8=True, method="twopass")
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 16).mean() < 0.01, (diff > 16).mean()


def test_warp_full_board_pipeline_vs_cv2(img512: np.ndarray, rng_mod: np.random.Generator) -> None:
    """quad → homography → warp → gray → flip, exactly the reference stage
    order (core.py:298-300), compared end to end."""
    quad = _random_quad(rng_mod, 512, 512)
    dst = np.array([[0, 0], [512, 0], [512, 512], [0, 512]], np.float32)

    m_cv = cv2.getPerspectiveTransform(quad, dst)
    board_cv = cv2.warpPerspective(img512, m_cv, (512, 512))
    board_cv = cv2.cvtColor(board_cv, cv2.COLOR_BGR2GRAY)
    board_cv = cv2.flip(board_cv, 1)

    m = ops.get_perspective_transform(quad, dst)
    warped = ops.warp_perspective(img512, m, (512, 512))
    gray = ops.bgr_to_gray(warped)
    board = np.asarray(ops.hflip(gray))
    board_u8 = np.clip(np.round(board), 0, 255).astype(np.uint8)

    diff = np.abs(board_u8.astype(int) - board_cv.astype(int))
    assert diff.mean() < 1.0
    assert (diff > 4).mean() < 0.01


# --- square slicing ------------------------------------------------------------


def test_extract_squares_order() -> None:
    board = np.zeros((512, 512), dtype=np.uint8)
    for rank in range(8):
        for file in range(8):
            board[rank * 64 : (rank + 1) * 64, file * 64 : (file + 1) * 64] = rank * 8 + file
    squares = np.asarray(ops.extract_squares(board))
    assert squares.shape == (64, 64, 64, 1)
    for idx in [0, 7, 8, 15, 16, 23, 56, 63]:
        assert squares[idx, 0, 0, 0] == idx


def test_extract_squares_batch_consistent(rng_mod: np.random.Generator) -> None:
    boards = rng_mod.integers(0, 256, (2, 512, 512), dtype=np.uint8)
    batched = np.asarray(ops.extract_squares_batch(boards))
    assert batched.shape == (2, 64, 64, 64, 1)
    for i in range(2):
        single = np.asarray(ops.extract_squares(boards[i]))
        np.testing.assert_array_equal(batched[i], single)
