"""Grid-line refinement of warped boards — a deliberate accuracy stage the
reference pipeline lacks.

The mask-derived quadrangle is only as good as the UNet mask's edges: a
mask that bleeds a few (or a few dozen) pixels past the physical board
shifts the rectified 8×8 grid by part of a square, and every crop feeds
the classifier off-center.  Round-4 error analysis measured that exactly
this geometry error carried 32 of the 46 residual wrong squares on the
test set (RESULTS.md).  The reference has no recovery from it — its warp
is the final geometry (reference core.py:285-295).

This module detects the true grid inside the warped board and proposes a
per-axis affine correction, formulated TPU-first (no gathers, no
data-dependent shapes):

1. **Profiles**: |∂board/∂x| summed over rows → a 512-vector whose peaks
   are the vertical grid lines (same for y).  One elementwise op + one
   reduction.
2. **Conditioning**: 5-tap triangle smoothing, median subtraction, then
   sqrt — the sqrt stops a few very strong edges (board frame, monitor
   bezel) from outscoring the full 7-line comb (measured: linear scoring
   mis-locks catastrophically on 2/38 test boards, sqrt on none).
3. **Comb search**: score every (offset, spacing) candidate by the comb
   sum Σ_k profile[o + k·s], k = 1..7 (interior lines only — the k = 0/8
   border lines sit in warp-border contamination).  All candidates at
   once as ONE (B, 512) × (512, C) matmul against a precomputed comb
   matrix; argmax picks the grid.  ~3 MFLOP/board — noise on the MXU.
4. **Correction**: resample the board so the detected grid lands on the
   ideal one — two tiny per-board resample-matrix matmuls (hat weights,
   ≤ 2 nonzero per row), again MXU work, ~0.5 GFLOP/board.  bf16
   operands with f32 accumulation: each output pixel is a ≤ 2-term
   product sum, so the result is platform-identical (no long
   accumulation to reorder).

The engine arbitrates identity vs corrected per board by classifier
confidence (engine.py) — detection only ever *proposes*.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

BOARD_SIZE = 512
CELL = 64

# Candidate grid: line k sits at offset + k*spacing (k = 1..7).  Offsets
# cover ±half a square, spacings ±~10% — the raw quad is never wronger
# than that (it came from a real mask), and wider ranges admit
# degenerate combs that alias onto piece rows.
_OFFSETS = np.arange(-32.0, 32.5, 0.5, dtype=np.float32)  # 129
_SPACINGS = np.arange(58.0, 70.25, 0.25, dtype=np.float32)  # 49
_CAND = np.array(
    [(o, s) for o in _OFFSETS for s in _SPACINGS], dtype=np.float32
)  # (C, 2)


def _build_comb() -> np.ndarray:
    """(C, 512) hat-interpolation comb: W[c, x] = Σ_k hat(x − (o_c + k·s_c)).

    A profile·comb dot product therefore equals the sum of the profile
    linearly interpolated at the candidate's 7 interior line positions.
    """
    xs = np.arange(BOARD_SIZE, dtype=np.float32)
    lines = _CAND[:, 0:1] + _CAND[:, 1:2] * np.arange(1, 8, dtype=np.float32)  # (C, 7)
    w = np.zeros((len(_CAND), BOARD_SIZE), np.float32)
    for chunk in range(0, len(_CAND), 512):
        sl = slice(chunk, chunk + 512)
        d = np.maximum(0.0, 1.0 - np.abs(xs[None, None, :] - lines[sl, :, None]))
        w[sl] = d.sum(axis=1)
    return w


_COMB = _build_comb()

# 5-tap triangle smoothing of the profiles (grid lines are 1–3 px wide
# after the warp; smoothing makes the hat interpolation sub-pixel-stable).
_TRI = (np.array([1.0, 2.0, 3.0, 2.0, 1.0], np.float32) / 9.0).tolist()


def _profiles(boards: jnp.ndarray) -> jnp.ndarray:
    """(B, 512, 512) → (2B, 512) edge-energy profiles: first B rows are
    column profiles (vertical lines), last B are row profiles."""
    gx = jnp.abs(boards[:, :, 1:] - boards[:, :, :-1])  # (B, 512, 511)
    gy = jnp.abs(boards[:, 1:, :] - boards[:, :-1, :])
    col = jnp.pad(gx.sum(axis=1), ((0, 0), (0, 1)))
    row = jnp.pad(gy.sum(axis=2), ((0, 0), (0, 1)))
    return jnp.concatenate([col, row], axis=0)


def _condition(p: jnp.ndarray) -> jnp.ndarray:
    """Smooth + median-subtract + sqrt (see module docstring, step 2)."""
    sm = jnp.zeros_like(p)
    for i, w in enumerate(_TRI):
        sh = i - 2
        if sh < 0:
            sm = sm.at[:, :sh].add(w * p[:, -sh:])
        elif sh > 0:
            sm = sm.at[:, sh:].add(w * p[:, :-sh])
        else:
            sm = sm + w * p
    sm = jnp.maximum(sm - jnp.median(sm, axis=-1, keepdims=True), 0.0)
    return jnp.sqrt(sm)


def detect_grid(boards: jnp.ndarray) -> jnp.ndarray:
    """Detect the 8×8 grid in warped boards.

    ``boards``: (B, 512, 512) float32 (pass the uint8-rounded board — it
    makes detection invariant to sub-quantum platform numerics).
    Returns (B, 4) float32 rows ``(ox, sx, oy, sy)``: detected line k of
    axis a sits at ``o_a + k·s_a`` (ideal: o = 0, s = 64).
    """
    b = boards.shape[0]
    p = _condition(_profiles(boards.astype(jnp.float32)))  # (2B, 512)
    scores = p @ jnp.asarray(_COMB).T  # (2B, C) — one matmul for all candidates
    best = jnp.argmax(scores, axis=-1)  # (2B,)
    # candidate lookup as a one-hot matmul (gather-free on TPU)
    onehot = jax.nn.one_hot(best, _CAND.shape[0], dtype=jnp.float32)
    osel = onehot @ jnp.asarray(_CAND)  # (2B, 2) = (offset, spacing)
    return jnp.concatenate([osel[:b], osel[b:]], axis=1)  # (B, 4)


def _axis_resample_matrix(
    o: jnp.ndarray, s: jnp.ndarray, src_size: int = BOARD_SIZE, shift: float = 0.0
) -> jnp.ndarray:
    """(512, src_size) bf16 hat-resample matrix R with R[u, j] =
    hat((shift + o + u·s/64) − j): out = R @ src maps the detected grid
    onto the ideal one.  ≤ 2 nonzero weights per row (adjacent taps).
    ``shift``/``src_size`` support a margin-expanded source canvas whose
    coordinate j = shift + x maps board coordinate x (see engine.py)."""
    u = jnp.arange(BOARD_SIZE, dtype=jnp.float32)
    pos = jnp.float32(shift) + o + u * (s / jnp.float32(CELL))
    j = jnp.arange(src_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - j[None, :]))
    return w.astype(jnp.bfloat16)


def apply_correction(
    boards: jnp.ndarray, corr: jnp.ndarray, margin: int = 0
) -> jnp.ndarray:
    """Resample (B, 512 + 2·margin, 512 + 2·margin) boards into corrected
    (B, 512, 512) boards by per-board corrections (B, 4).

    Two batched matmuls (x then y): bf16 operands, f32 accumulation —
    each output pixel is a ≤ 4-term sum, so bf16 costs ≤ ~1 gray level
    and the result is bitwise platform-stable.  ``margin`` > 0 reads a
    margin-expanded warp canvas whose interior [m, m+512) is the board:
    detected grids that extend past the nominal board edge (offset < 0,
    or offset + 8·spacing > 512 — real boards the mask quad undershot)
    resample real pixels instead of the zero border.  Out-of-range
    positions still resample to 0.
    """
    src = BOARD_SIZE + 2 * margin
    mk = lambda o, s: _axis_resample_matrix(o, s, src_size=src, shift=float(margin))
    rx = jax.vmap(mk)(corr[:, 0], corr[:, 1])  # (B, 512, src)
    ry = jax.vmap(mk)(corr[:, 2], corr[:, 3])
    b16 = boards.astype(jnp.bfloat16)
    # x pass: out[b, i, u] = Σ_j board[b, i, j] · rx[b, u, j]
    t = jax.lax.dot_general(
        b16, rx, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (B, src(i), 512(u))
    # y pass: out[b, v, u] = Σ_i ry[b, v, i] · t[b, i, u]
    out = jax.lax.dot_general(
        ry,
        t.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out


def refined_quadrangle(ms: jnp.ndarray, corr: jnp.ndarray) -> jnp.ndarray:
    """Image-space corners of the CORRECTED board.

    ``ms``: (B, 3, 3) homographies mapping the mask quad (image coords) to
    the 512² destination; ``corr``: (B, 4) detected corrections.  The
    corrected board samples the image at M⁻¹(A(x)), so its corners are
    M⁻¹ applied to A of the ideal corners — same corner order as the
    engine's ``_DEST`` (reference orientation convention).
    """
    from chessvision_tpu.ops.warp import invert_homography

    minv = jax.vmap(invert_homography)(ms)  # (B, 3, 3)
    cx = jnp.asarray([0.0, BOARD_SIZE, BOARD_SIZE, 0.0], jnp.float32)
    cy = jnp.asarray([0.0, 0.0, BOARD_SIZE, BOARD_SIZE], jnp.float32)
    ax = corr[:, 0:1] + cx[None, :] * (corr[:, 1:2] / CELL)  # (B, 4)
    ay = corr[:, 2:3] + cy[None, :] * (corr[:, 3:4] / CELL)
    ones = jnp.ones_like(ax)
    pts = jnp.stack([ax, ay, ones], axis=1)  # (B, 3, 4)
    img = jnp.einsum("bij,bjk->bik", minv, pts)  # (B, 3, 4)
    return (img[:, :2] / img[:, 2:3]).transpose(0, 2, 1)  # (B, 4, 2)
