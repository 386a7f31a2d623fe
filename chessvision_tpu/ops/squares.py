"""8×8 square slicing of rectified boards.

Pure reshape/transpose — identical element order to reference
core.py:419-439 (row-major over ranks then files, a8 first in normal
orientation), with a batched variant for the fused pipeline.  XLA compiles
these to free layout changes.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_squares(board: jnp.ndarray) -> jnp.ndarray:
    """(H, W) board → (64, H//8, W//8, 1) squares, rank-major."""
    h, w = board.shape
    sh, sw = h // 8, w // 8
    squares = board.reshape(8, sh, 8, sw)
    squares = squares.transpose(0, 2, 1, 3)
    return squares.reshape(64, sh, sw, 1)


def extract_squares_batch(boards: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) boards → (B, 64, H//8, W//8, 1) squares."""
    b, h, w = boards.shape
    sh, sw = h // 8, w // 8
    squares = boards.reshape(b, 8, sh, 8, sw)
    squares = squares.transpose(0, 1, 3, 2, 4)
    return squares.reshape(b, 64, sh, sw, 1)
