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

ROW_BLOCK = 32  # rows per program (looped in sub-chunks of 8 inside)
SUB_ROWS = 8  # f32 sublane tile
U_TILE = 128  # output-lane tile per inner step
WINDOW = 256  # source band width
QUANT = 64  # window-start quantization


def _kernel(src_ref, pos_ref, out_ref):
    """One program handles a (ROW_BLOCK, U) block, looping over
    (SUB_ROWS, U_TILE) sub-tiles — large blocks amortize grid-launch
    overhead while the (8, 128, 256) weight tensor stays ~1 MB in VMEM."""
    src_w = src_ref.shape[-1]
    u_total = pos_ref.shape[-1]

    for r0 in range(0, ROW_BLOCK, SUB_ROWS):
        for t0 in range(0, u_total, U_TILE):
            pos = pos_ref[r0 : r0 + SUB_ROWS, t0 : t0 + U_TILE]

            start_f = jnp.floor(jnp.min(pos)) - 1.0
            start_q = jnp.clip(
                (start_f / QUANT).astype(jnp.int32) * QUANT, 0, src_w - WINDOW
            )
            # NOTE: a dynamic lane-offset slice (pl.ds + multiple_of) would
            # be the natural band select, but it crashes this backend's
            # Mosaic compiler; a switch over the static QUANT-aligned
            # slices compiles fine.
            n_starts = (src_w - WINDOW) // QUANT + 1

            def make_branch(s: int, r0=r0):
                def branch():
                    return src_ref[r0 : r0 + SUB_ROWS, s * QUANT : s * QUANT + WINDOW]

                return branch

            window = jax.lax.switch(
                start_q // QUANT, [make_branch(s) for s in range(n_starts)]
            )

            start = start_q.astype(jnp.float32)
            # Mosaic iota must be integer-typed; cast after
            j = start + jax.lax.broadcasted_iota(jnp.int32, (1, 1, WINDOW), 2).astype(
                jnp.float32
            )
            # clamp into the band with ±0.999 slack so border positions keep
            # their partial hat weight (constant-zero border like cv2);
            # fully-out-of-image positions are zeroed by the validity mask
            pos_c = jnp.clip(pos, start - 0.999, start + WINDOW - 1.0 + 0.999)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_c[:, :, None] - j))
            valid = (pos > -1.0) & (pos < jnp.float32(src_w))
            out = jnp.sum(w * window[:, None, :], axis=-1)
            out_ref[r0 : r0 + SUB_ROWS, t0 : t0 + U_TILE] = jnp.where(valid, out, 0.0)


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

    grid = (n // ROW_BLOCK,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, j), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, u), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, u), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, u), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * u * WINDOW,
            bytes_accessed=4 * (n * j + 2 * n * u),
            transcendentals=0,
        ),
    )(src.astype(jnp.float32), pos.astype(jnp.float32))
