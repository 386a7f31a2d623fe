"""Pallas TPU kernels for the hot geometry ops.

``banded_resample``: the 1-D hat-function resample at the core of the
two-pass projective warp (ops/warp.py), restricted to a narrow source
band per output tile instead of the full 512-wide row.  The plain XLA
formulation must contract every output against every source column (a
512-wide fused multiply-reduce) because the band position is
data-dependent; in Pallas the band is selected with a ``lax.switch`` over
static slices (window start quantized), cutting the VPU work and keeping
every operand in VMEM.  No gathers anywhere — per-lane gathers run at
scalar speed on TPU.

Two configurations (measure with scripts/microbench.py):

- ``wide``  (window 256, 128-output tiles, start quantized to 64): ½ the
  VPU terms of the XLA full-width form.  Measured 68–80 ms vs XLA's 59 ms
  per 128 boards on v5e at round 2 — switch/layout overhead ate the win.
- ``narrow`` (window 128, 64-output tiles, start quantized to 32): ¼ the
  terms; smaller tiles pay more switch overhead per term.  Measured at
  round 3 on v5e: 69.2 ms vs wide's 60.8 and XLA full-width's ~55 — AND
  the 64-lane output tiles miscompile under this backend's Mosaic
  (results differ from the reference; interpret mode is correct).  Kept
  as an interpret-mode reference only; never dispatched in production.
  With ARCHITECTURE.md's arithmetic showing XLA full-width already at
  81–97% of VPU peak, banding cannot win here: a ≥2× term reduction is
  eaten by switch/layout overhead before it reaches the ALUs.

Window-coverage bound: positions are affine-monotone within a tile and a
quadrangle contained in a 512² image has per-axis sampling scale ≤ ~1.42
(diagonal/side), so a T-output tile spans ≤ T·1.42 + 2 source columns
(183 for T=128, 93 for T=64); with (quant−1) columns lost to start
quantization the window always covers it (183+63 ≤ 256, 93+31 ≤ 128).
Positions are additionally clamped to the window so pathological
homographies degrade gracefully instead of reading out of band.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class BandConfig:
    row_block: int = 32  # rows per program (looped in sub-chunks inside)
    sub_rows: int = 8  # f32 sublane tile
    u_tile: int = 128  # output-lane tile per inner step
    window: int = 256  # source band width
    quant: int = 64  # window-start quantization


WIDE = BandConfig()
NARROW = BandConfig(u_tile=64, window=128, quant=32)

# module-level aliases used by the warp dispatch eligibility check
ROW_BLOCK = WIDE.row_block
U_TILE = WIDE.u_tile
WINDOW = WIDE.window
QUANT = WIDE.quant


def _make_kernel(cfg: BandConfig):
    def _kernel(src_ref, pos_ref, out_ref):
        """One program handles a (row_block, U) block, looping over
        (sub_rows, u_tile) sub-tiles — large blocks amortize grid-launch
        overhead while the weight tensor stays small in VMEM."""
        src_w = src_ref.shape[-1]
        u_total = pos_ref.shape[-1]

        for r0 in range(0, cfg.row_block, cfg.sub_rows):
            for t0 in range(0, u_total, cfg.u_tile):
                pos = pos_ref[r0 : r0 + cfg.sub_rows, t0 : t0 + cfg.u_tile]

                start_f = jnp.floor(jnp.min(pos)) - 1.0
                start_q = jnp.clip(
                    (start_f / cfg.quant).astype(jnp.int32) * cfg.quant,
                    0,
                    src_w - cfg.window,
                )
                # NOTE: a dynamic lane-offset slice (pl.ds + multiple_of)
                # would be the natural band select, but it crashes this
                # backend's Mosaic compiler; a switch over the static
                # quant-aligned slices compiles fine.
                n_starts = (src_w - cfg.window) // cfg.quant + 1

                def make_branch(s: int, r0=r0):
                    def branch():
                        return src_ref[
                            r0 : r0 + cfg.sub_rows, s * cfg.quant : s * cfg.quant + cfg.window
                        ]

                    return branch

                window = jax.lax.switch(
                    start_q // cfg.quant, [make_branch(s) for s in range(n_starts)]
                )

                start = start_q.astype(jnp.float32)
                # Mosaic iota must be integer-typed; cast after
                j = start + jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, cfg.window), 2
                ).astype(jnp.float32)
                # clamp into the band with ±0.999 slack so border positions
                # keep their partial hat weight (constant-zero border like
                # cv2); fully-out-of-image positions are zeroed by the mask
                pos_c = jnp.clip(pos, start - 0.999, start + cfg.window - 1.0 + 0.999)
                w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_c[:, :, None] - j))
                valid = (pos > -1.0) & (pos < jnp.float32(src_w))
                out = jnp.sum(w * window[:, None, :], axis=-1)
                out_ref[r0 : r0 + cfg.sub_rows, t0 : t0 + cfg.u_tile] = jnp.where(
                    valid, out, 0.0
                )

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret", "config"))
def banded_resample(
    src: jnp.ndarray,
    pos: jnp.ndarray,
    interpret: bool = False,
    config: str = "wide",
) -> jnp.ndarray:
    """Per-row banded 1-D linear resample.

    ``src`` (N, J) float32 rows, ``pos`` (N, U) float32 sample positions
    (monotone-ish per row; out-of-range → zero weight / clamped band).
    Returns (N, U).  N must be a multiple of row_block and U of u_tile;
    J ≥ window and J ≡ 0 (mod quant).  ``config``: "wide" or "narrow".
    """
    cfg = {"wide": WIDE, "narrow": NARROW}[config]
    n, j = src.shape
    u = pos.shape[1]
    assert (
        n % cfg.row_block == 0 and u % cfg.u_tile == 0 and j >= cfg.window and j % cfg.quant == 0
    ), (n, u, j, cfg)

    grid = (n // cfg.row_block,)
    return pl.pallas_call(
        _make_kernel(cfg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((cfg.row_block, j), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.row_block, u), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cfg.row_block, u), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, u), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * u * cfg.window,
            bytes_accessed=4 * (n * j + 2 * n * u),
            transcendentals=0,
        ),
    )(src.astype(jnp.float32), pos.astype(jnp.float32))
