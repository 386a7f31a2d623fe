"""Pallas TPU kernels for the hot geometry ops.

``banded_resample``: the 1-D hat-function resample at the core of the
two-pass projective warp (ops/warp.py), restricted to a 256-wide source
band per 128-output tile instead of the full 512-wide row.  The plain XLA
formulation must contract every output against every source column (a
512-wide fused multiply-reduce) because the band position is
data-dependent; in Pallas the band is selected with a ``lax.switch`` over
five static 256-slices (window start quantized to 64), halving the VPU
work and keeping every operand in VMEM.  No gathers anywhere — per-lane
gathers run at scalar speed on TPU.

Window-coverage bound: positions are affine-monotone within a tile and a
quadrangle contained in a 512² image has per-axis sampling scale ≤ ~1.42
(diagonal/side), so a 128-output tile spans ≤ 128·1.42 + 2 ≈ 184 source
columns; with ≤63 columns lost to start quantization the 256 window always
covers it.  Positions are additionally clamped to the window so
pathological homographies degrade gracefully instead of reading out of
band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8  # f32 sublane tile
U_TILE = 128  # output-lane tile
WINDOW = 256  # source band width
QUANT = 64  # window-start quantization


def _kernel(src_ref, pos_ref, out_ref):
    pos = pos_ref[:, :]  # (ROW_BLOCK, U_TILE) float32 source positions
    src_w = src_ref.shape[-1]
    n_starts = (src_w - WINDOW) // QUANT + 1

    start_f = jnp.floor(jnp.min(pos)) - 1.0
    start_q = jnp.clip(
        (start_f / QUANT).astype(jnp.int32) * QUANT, 0, src_w - WINDOW
    )

    def make_branch(s: int):
        def branch():
            return src_ref[:, s * QUANT : s * QUANT + WINDOW]

        return branch

    window = jax.lax.switch(start_q // QUANT, [make_branch(s) for s in range(n_starts)])

    start = start_q.astype(jnp.float32)
    j = start + jax.lax.broadcasted_iota(jnp.float32, (1, 1, WINDOW), 2)
    # clamp into the band with ±0.999 slack so border positions keep their
    # partial hat weight (constant-zero border like cv2); positions fully
    # outside the image are zeroed by the validity mask below
    pos_c = jnp.clip(pos, start - 0.999, start + WINDOW - 1.0 + 0.999)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_c[:, :, None] - j))  # (8, 128, 256)
    valid = (pos > -1.0) & (pos < jnp.float32(src_w))
    out = jnp.sum(w * window[:, None, :], axis=-1)
    out_ref[:, :] = jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def banded_resample(src: jnp.ndarray, pos: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Per-row banded 1-D linear resample.

    ``src`` (N, J) float32 rows, ``pos`` (N, U) float32 sample positions
    (monotone-ish per row; out-of-range → zero weight / clamped band).
    Returns (N, U).  N must be a multiple of 8 and U of 128; J ≥ 256 and
    J ≡ 0 (mod 64).
    """
    n, j = src.shape
    u = pos.shape[1]
    assert n % ROW_BLOCK == 0 and u % U_TILE == 0 and j >= WINDOW and j % QUANT == 0, (n, u, j)

    grid = (n // ROW_BLOCK, u // U_TILE)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, j), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, U_TILE), lambda i, t: (i, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, U_TILE), lambda i, t: (i, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, u), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * u * WINDOW,
            bytes_accessed=4 * (n * j + 2 * n * u),
            transcendentals=0,
        ),
    )(src.astype(jnp.float32), pos.astype(jnp.float32))
