"""Native C++ loader tests: decode/resize parity vs cv2 and prefetcher
behaviour on the checked-in fixtures."""

from pathlib import Path

import numpy as np
import pytest

from chessvision_tpu import constants
from chessvision_tpu import native_loader as nl

IMAGE_DIR = Path(constants.DATA_ROOT) / "board_extraction" / "images"
MASK_DIR = Path(constants.DATA_ROOT) / "board_extraction" / "masks"

pytestmark = pytest.mark.skipif(
    not nl.available() or not IMAGE_DIR.exists(), reason="cvloader or fixtures unavailable"
)


def _some_images(n: int) -> list[str]:
    return [str(p) for p in sorted(IMAGE_DIR.glob("*.JPG"))[:n]]


def test_load_image_matches_cv2() -> None:
    import cv2

    path = _some_images(1)[0]
    got = nl.load_image(path, 256, 256, 3)
    want = cv2.imread(path)
    if want.shape[:2] != (256, 256):
        want = cv2.resize(want, (256, 256), interpolation=cv2.INTER_AREA)
    diff = np.abs(got.astype(int) - want.astype(int))
    # libjpeg IDCT may differ from cv2's by ±1-2 levels; resize adds <1
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 8).mean() < 0.01


def test_load_image_grayscale_png() -> None:
    import cv2

    path = str(sorted(MASK_DIR.glob("*.png"))[0])
    got = nl.load_image(path, 256, 256, 1)
    want = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if want.shape != (256, 256):
        want = cv2.resize(want, (256, 256), interpolation=cv2.INTER_AREA)
    # binary masks: thresholded agreement is what matters
    agree = ((got > 127) == (want > 127)).mean()
    assert agree > 0.995, agree


def test_load_batch_parallel() -> None:
    paths = _some_images(16)
    batch, failures = nl.load_batch(paths, 256, 256, 3, n_threads=8)
    assert batch.shape == (16, 256, 256, 3)
    assert failures == 0
    # deterministic: same content as single loads
    single = nl.load_image(paths[3], 256, 256, 3)
    np.testing.assert_array_equal(batch[3], single)


def test_load_batch_missing_file_zeroed() -> None:
    paths = _some_images(2) + ["/nonexistent/nope.jpg"]
    batch, failures = nl.load_batch(paths, 64, 64, 3)
    assert failures == 1
    assert batch[2].sum() == 0
    assert batch[0].sum() > 0


def test_prefetcher_cycles_and_shuffles() -> None:
    paths = _some_images(10)
    pf = nl.Prefetcher(paths, batch=4, h=128, w=128, channels=3, n_threads=4, shuffle=True, seed=7)
    seen = []
    for _ in range(6):  # 24 draws over 10 files -> multiple epochs
        batch, idx = pf.next()
        assert batch.shape == (4, 128, 128, 3)
        assert ((idx >= 0) & (idx < 10)).all()
        seen.extend(idx.tolist())
    pf.close()
    assert len(set(seen)) == 10  # every file visited across epochs


def test_pack_yuv444_native_matches_numpy() -> None:
    """The fused C++ yuv444 pack must be bit-identical to the numpy
    fallback in engine.pack_inputs_yuv444 (the engine swaps between them
    by availability; the device reconstruction assumes one codec)."""
    if not nl.has_pack_yuv444():
        pytest.skip("cvloader built without cvl_pack_yuv444")
    from chessvision_tpu import engine as E

    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (5, 512, 512, 3), np.uint8)
    comp, gray = E.pack_inputs(batch)
    cb_n, cr_n, gres_n = nl.pack_yuv444(comp, gray)

    orig = nl.has_pack_yuv444
    nl.has_pack_yuv444 = lambda: False
    try:
        gray2, cb2, cr2, gres2 = E.pack_inputs_yuv444(batch)
    finally:
        nl.has_pack_yuv444 = orig
    np.testing.assert_array_equal(gray, gray2)
    np.testing.assert_array_equal(cb_n, cb2)
    np.testing.assert_array_equal(cr_n, cr2)
    np.testing.assert_array_equal(gres_n, gres2)


def test_pack_yuv420_native_matches_numpy() -> None:
    """The fused C++ 4:2:0 pack must be bit-identical to the numpy
    fallback (both implement the same integer round-half-up subsampled
    diff), including non-power-of-two luma factors (768²)."""
    if not nl.has_pack_yuv420():
        pytest.skip("cvloader built without cvl_pack_yuv420")
    from chessvision_tpu import engine as E

    rng = np.random.default_rng(8)
    for size in (512, 768):
        batch = rng.integers(0, 256, (3, size, size, 3), np.uint8)
        comp, gray = E.pack_inputs(batch)
        cb_n, cr_n = nl.pack_yuv420(comp, gray)

        orig = nl.has_pack_yuv420
        nl.has_pack_yuv420 = lambda: False
        try:
            _, cb2, cr2 = E.pack_inputs_yuv(batch)
        finally:
            nl.has_pack_yuv420 = orig
        np.testing.assert_array_equal(cb_n, cb2)
        np.testing.assert_array_equal(cr_n, cr2)
