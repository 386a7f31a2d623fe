"""Grid-refinement ops (ops/gridfix.py): detection recovers synthetic
misalignments, the resample correction is exact at identity, and the
refined quadrangle degenerates to the input quad at identity."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chessvision_tpu.ops import gridfix
from chessvision_tpu.ops.warp import get_perspective_transform


def synthetic_board(o: float, s: float, o2: float | None = None, s2: float | None = None) -> np.ndarray:
    """512² board with dark grid lines at o + k·s (x) and o2 + k·s2 (y),
    k = 0..8, light/dark squares, integer uint8 values."""
    o2 = o if o2 is None else o2
    s2 = s if s2 is None else s2
    img = np.full((512, 512), 180.0, np.float32)
    # square shading so profiles also contain square-color edges (realistic)
    for r in range(8):
        for c in range(8):
            if (r + c) % 2 == 0:
                y0 = int(round(o2 + r * s2))
                x0 = int(round(o + c * s))
                img[max(y0, 0) : y0 + int(s2), max(x0, 0) : x0 + int(s)] = 120.0
    for k in range(9):
        x = int(round(o + k * s))
        y = int(round(o2 + k * s2))
        if 0 <= x < 511:
            img[:, x : x + 2] = 30.0
        if 0 <= y < 511:
            img[y : y + 2, :] = 30.0
    return img


class TestDetectGrid:
    def test_recovers_shift_and_spacing(self):
        cases = [(0.0, 64.0), (8.0, 64.0), (-12.0, 66.0), (5.0, 61.0)]
        boards = jnp.asarray(np.stack([synthetic_board(o, s) for o, s in cases]))
        corr = np.asarray(gridfix.detect_grid(boards))
        for i, (o, s) in enumerate(cases):
            ox, sx, oy, sy = corr[i]
            # the drawn 2-px lines put their energy centroid ~0.5-1 px right
            # of the nominal position; accept within 1.5 px / 0.5 px-per-cell
            assert abs(ox - o) <= 1.5, (cases[i], corr[i])
            assert abs(sx - s) <= 0.5, (cases[i], corr[i])
            assert abs(oy - o) <= 1.5, (cases[i], corr[i])
            assert abs(sy - s) <= 0.5, (cases[i], corr[i])

    def test_anisotropic_axes(self):
        boards = jnp.asarray(synthetic_board(10.0, 62.0, -6.0, 65.0)[None])
        ox, sx, oy, sy = np.asarray(gridfix.detect_grid(boards))[0]
        assert abs(ox - 10.0) <= 1.5 and abs(sx - 62.0) <= 0.5
        assert abs(oy + 6.0) <= 1.5 and abs(sy - 65.0) <= 0.5


class TestApplyCorrection:
    def test_identity_is_exact_on_integer_boards(self):
        # uint8-valued boards are exactly representable in bf16, and the
        # identity resample matrix is exactly the identity, so the
        # round-trip must be bit-exact
        rng = np.random.default_rng(0)
        boards = rng.integers(0, 256, (2, 512, 512)).astype(np.float32)
        corr = jnp.asarray([[0.0, 64.0, 0.0, 64.0]] * 2)
        out = np.asarray(gridfix.apply_correction(jnp.asarray(boards), corr))
        np.testing.assert_array_equal(out, boards)

    def test_pure_shift_moves_content(self):
        boards = np.zeros((1, 512, 512), np.float32)
        boards[0, :, 100] = 255.0  # one bright column at x=100
        corr = jnp.asarray([[4.0, 64.0, 0.0, 64.0]])  # sample at x+4
        out = np.asarray(gridfix.apply_correction(jnp.asarray(boards), corr))
        assert out[0, 256, 96] == 255.0  # content shifts left by 4
        assert out[0, 256, 100] == 0.0

    def test_correction_straightens_detected_grid(self):
        board = synthetic_board(9.0, 62.0)
        b = jnp.asarray(board[None])
        corr = gridfix.detect_grid(b)
        fixed = gridfix.apply_correction(b, corr)
        corr2 = np.asarray(gridfix.detect_grid(jnp.clip(jnp.round(fixed), 0, 255)))[0]
        # after correction the detector should report ~identity; the 2-px
        # synthetic lines leave their gradient centroid up to 2 px from the
        # nominal position, so accept that residual
        assert abs(corr2[0]) <= 2.0 and abs(corr2[1] - 64.0) <= 0.75, corr2
        assert abs(corr2[2]) <= 2.0 and abs(corr2[3] - 64.0) <= 0.75, corr2


class TestRefinedQuadrangle:
    def test_identity_returns_input_quad(self):
        quad = jnp.asarray(
            [[37.0, 22.0], [470.0, 35.0], [455.0, 490.0], [25.0, 460.0]], jnp.float32
        )
        dest = jnp.asarray(
            [[0.0, 0.0], [512.0, 0.0], [512.0, 512.0], [0.0, 512.0]], jnp.float32
        )
        m = get_perspective_transform(quad, dest)[None]
        corr = jnp.asarray([[0.0, 64.0, 0.0, 64.0]])
        out = np.asarray(gridfix.refined_quadrangle(m, corr))[0]
        np.testing.assert_allclose(out, np.asarray(quad), atol=1e-2)

    def test_shift_moves_corners_inward(self):
        # a positive offset + shrunk spacing means the true board sits
        # inside the mask quad; the refined corners must move inward
        quad = jnp.asarray(
            [[0.0, 0.0], [512.0, 0.0], [512.0, 512.0], [0.0, 512.0]], jnp.float32
        )
        dest = quad
        m = get_perspective_transform(quad, dest)[None]
        corr = jnp.asarray([[16.0, 60.0, 16.0, 60.0]])  # grid spans [16, 496]
        out = np.asarray(gridfix.refined_quadrangle(m, corr))[0]
        np.testing.assert_allclose(
            out, [[16, 16], [496, 16], [496, 496], [16, 496]], atol=1e-3
        )


class TestMarginResample:
    def test_margin_recovers_pixels_beyond_the_nominal_edge(self):
        # A detected grid extending past row 512 (offset 0, spacing 66 —
        # the board is bigger than the mask quad assumed, the 16c72614
        # failure shape): with margin, the resample reads real ring
        # pixels; without, the amputated region comes back zero.
        m = 32
        wide = jnp.tile(
            jnp.arange(512 + 2 * m, dtype=jnp.float32)[None, :, None], (1, 1, 512 + 2 * m)
        )  # wide[y, x] = y (board coord y - m)
        corr = jnp.asarray([[0.0, 64.0, 0.0, 66.0]])  # rows span [0, 528)
        out_m = np.asarray(gridfix.apply_correction(wide, corr, margin=m))[0]
        out_0 = np.asarray(
            gridfix.apply_correction(wide[:, m : m + 512, m : m + 512], corr)
        )[0]
        # in-range rows agree (both sample the same board coordinate, and
        # wide[y_wide] = y_wide means both read m + y·66/64) to bf16 tol
        np.testing.assert_allclose(out_m[:256], out_0[:256], atol=2.5)
        # the last output row samples board row 511·66/64 ≈ 527 — beyond
        # the nominal canvas: zero without the margin, real with it
        assert out_0[511].max() == 0.0
        np.testing.assert_allclose(out_m[511], m + 511 * 66 / 64, atol=2.5)

    def test_margin_zero_is_the_identity_configuration(self):
        rng = np.random.default_rng(3)
        boards = jnp.asarray(rng.uniform(0, 255, (2, 512, 512)).astype(np.float32))
        corr = jnp.asarray([[-3.0, 65.0, 2.0, 63.5], [0.0, 64.0, 0.0, 64.0]])
        a = np.asarray(gridfix.apply_correction(boards, corr))
        b = np.asarray(gridfix.apply_correction(boards, corr, margin=0))
        np.testing.assert_array_equal(a, b)
