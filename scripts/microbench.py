"""Microbenchmarks for hot-op formulation choices on the current backend.

Compares candidate implementations of the warp's 1-D hat resample and the
quadrangle sub-stages so optimization is driven by measured numbers, not
guesses.  Forced scalar host transfers are the sync (CLAUDE.md).

Usage: python scripts/microbench.py [--which warp|quad|all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=5, name=None):
    if name:
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
    out = fn(*args)
    x = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(x.astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        x = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(x.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    ms = round(float(np.median(ts)) * 1000, 2)
    if name:
        print(f"[bench] {name}: {ms} ms", file=sys.stderr, flush=True)
    return ms


# ---------------- warp resample candidates ----------------
# rows = B*H = 65536, J = 512 source cols, U = 512 outputs per row.
ROWS, J, U = 128 * 512, 512, 512
TILE = 128  # outputs per band tile
WINDOW = 256
QUANT = 64


def hat_full(src, pos):
    jj = jnp.arange(J, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - jj))
    return jnp.sum(w * src[:, None, :], axis=-1)


def hat_banded(src, pos):
    """Band-limited hat resample: per (row, 128-output tile), select a
    256-wide source band (start quantized to 64) and contract only against
    it.  Nonzero hat weights always fall inside the band for in-engine
    homographies, so the result is bit-identical to the full contraction
    (adding exact zeros in any order is exact)."""
    nt = U // TILE
    post = pos.reshape(ROWS, nt, TILE)
    start = jnp.floor(jnp.min(jnp.clip(post, -1e6, 1e6), axis=-1)) - 1.0
    n_starts = (J - WINDOW) // QUANT + 1
    k = jnp.clip((start / QUANT).astype(jnp.int32), 0, n_starts - 1)  # (ROWS, nt)
    # band select: chain of predicated picks over the static QUANT-aligned
    # slices; optimization_barrier keeps XLA from refusing the materialize
    cands = [src[:, q * QUANT : q * QUANT + WINDOW] for q in range(n_starts)]
    band = jnp.zeros((ROWS, nt, WINDOW), jnp.float32)
    for q in range(n_starts):
        band = jnp.where((k == q)[:, :, None], cands[q][:, None, :], band)
    band = lax.optimization_barrier(band)
    base = k.astype(jnp.float32) * QUANT  # (ROWS, nt)
    rel = post - base[:, :, None]
    jj = jnp.arange(WINDOW, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, :, :, None] - jj))
    out = jnp.sum(w * band[:, :, None, :], axis=-1)
    return out.reshape(ROWS, U)


def hat_banded_nobarrier(src, pos):
    nt = U // TILE
    post = pos.reshape(ROWS, nt, TILE)
    start = jnp.floor(jnp.min(jnp.clip(post, -1e6, 1e6), axis=-1)) - 1.0
    n_starts = (J - WINDOW) // QUANT + 1
    k = jnp.clip((start / QUANT).astype(jnp.int32), 0, n_starts - 1)
    cands = [src[:, q * QUANT : q * QUANT + WINDOW] for q in range(n_starts)]
    band = jnp.zeros((ROWS, nt, WINDOW), jnp.float32)
    for q in range(n_starts):
        band = jnp.where((k == q)[:, :, None], cands[q][:, None, :], band)
    base = k.astype(jnp.float32) * QUANT
    rel = post - base[:, :, None]
    jj = jnp.arange(WINDOW, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, :, :, None] - jj))
    out = jnp.sum(w * band[:, :, None, :], axis=-1)
    return out.reshape(ROWS, U)


def hat_full_T(src, pos):
    """j on the middle axis: reduce over sublane-tiles, u stays on lanes."""
    jj = jnp.arange(J, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None, :] - jj[:, None]))  # (R, J, U)
    return jnp.sum(w * src[:, :, None], axis=1)


def hat_banded_T(src, pos):
    """Banded + j on the middle axis."""
    nt = U // TILE
    post = pos.reshape(ROWS, nt, TILE)
    start = jnp.floor(jnp.min(jnp.clip(post, -1e6, 1e6), axis=-1)) - 1.0
    n_starts = (J - WINDOW) // QUANT + 1
    k = jnp.clip((start / QUANT).astype(jnp.int32), 0, n_starts - 1)
    cands = jnp.stack([src[:, q * QUANT : q * QUANT + WINDOW] for q in range(n_starts)], axis=1)
    k_b = jnp.broadcast_to(k[:, :, None], (ROWS, nt, WINDOW))
    band = jnp.take_along_axis(cands, k_b, axis=1)  # (R, nt, WINDOW)
    base = k.astype(jnp.float32) * QUANT
    rel = post - base[:, :, None]  # (R, nt, TILE)
    jj = jnp.arange(WINDOW, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, :, None, :] - jj[None, None, :, None]))
    out = jnp.sum(w * band[:, :, :, None], axis=2)  # (R, nt, TILE)
    return out.reshape(ROWS, U)


def hat_banded_T_selectn(src, pos):
    """Banded, j-middle, band picked with lax.select_n (single multi-way
    select instead of a where-chain)."""
    nt = U // TILE
    post = pos.reshape(ROWS, nt, TILE)
    start = jnp.floor(jnp.min(jnp.clip(post, -1e6, 1e6), axis=-1)) - 1.0
    n_starts = (J - WINDOW) // QUANT + 1
    k = jnp.clip((start / QUANT).astype(jnp.int32), 0, n_starts - 1)
    cands = [
        jnp.broadcast_to(src[:, None, q * QUANT : q * QUANT + WINDOW], (ROWS, nt, WINDOW))
        for q in range(n_starts)
    ]
    band = lax.select_n(jnp.broadcast_to(k[:, :, None], (ROWS, nt, WINDOW)), *cands)
    base = k.astype(jnp.float32) * QUANT
    rel = post - base[:, :, None]
    jj = jnp.arange(WINDOW, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel[:, :, None, :] - jj[None, None, :, None]))
    out = jnp.sum(w * band[:, :, :, None], axis=2)
    return out.reshape(ROWS, U)


def hat_gather(src, pos):
    """2-tap gather formulation via one take_along_axis per row."""
    i0 = jnp.clip(jnp.floor(pos), -1.0, jnp.float32(J))
    f = pos - i0
    i0i = jnp.clip(i0.astype(jnp.int32), 0, J - 1)
    i1i = jnp.clip(i0i + 1, 0, J - 1)
    idx = jnp.concatenate([i0i, i1i], axis=1)
    vals = jnp.take_along_axis(src, idx, axis=1)
    v0, v1 = vals[:, :U], vals[:, U:]
    w0 = jnp.maximum(0.0, 1.0 - jnp.abs(pos - i0))
    w1 = jnp.maximum(0.0, 1.0 - jnp.abs(pos - (i0 + 1.0)))
    return w0 * v0 + w1 * v1


def bench_warp(iters):
    key = jax.random.PRNGKey(1)
    src = jax.random.uniform(key, (ROWS, J), jnp.float32, 0, 255)
    # realistic monotone positions: mild projective ramp per row
    u = jnp.arange(U, dtype=jnp.float32)[None, :]
    slope = 0.8 + 0.4 * jax.random.uniform(key, (ROWS, 1))
    off = 40.0 * jax.random.uniform(key, (ROWS, 1))
    pos = off + slope * u * (J / (slope * U + 1e-6)) * 0.9
    res = {}
    res["hat_full"] = timeit(jax.jit(hat_full), src, pos, iters=iters, name="hat_full")
    res["hat_full_T"] = timeit(jax.jit(hat_full_T), src, pos, iters=iters, name="hat_full_T")
    res["hat_banded_T"] = timeit(jax.jit(hat_banded_T), src, pos, iters=iters, name="hat_banded_T")
    res["hat_banded_T_selectn"] = timeit(jax.jit(hat_banded_T_selectn), src, pos, iters=iters, name="hat_banded_T_selectn")
    res["hat_banded"] = timeit(jax.jit(hat_banded), src, pos, iters=iters, name="hat_banded")
    # Pallas banded kernels (wide = round-2 256-window; narrow = 128-window
    # 64-output tiles — ¼ the terms of full width, more switch overhead)
    import functools

    from chessvision_tpu.ops.pallas_kernels import banded_resample

    for cfg in ("wide", "narrow"):
        try:
            fn = functools.partial(banded_resample, config=cfg)
            res[f"pallas_{cfg}"] = timeit(fn, src, pos, iters=iters, name=f"pallas_{cfg}")
            res[f"pallas_{cfg}_equal_full"] = bool(
                jnp.allclose(jax.jit(hat_full)(src, pos), fn(src, pos), atol=1e-4)
            )
        except Exception as e:  # noqa: BLE001 — Mosaic may reject a config
            res[f"pallas_{cfg}"] = f"failed: {e}"[:200]
    # correctness cross-check (banded vs full) on this input
    full = jax.jit(hat_full)(src, pos)
    res["banded_equal_full"] = bool(jnp.array_equal(full, jax.jit(hat_banded)(src, pos)))
    res["bandedT_equal_full"] = bool(jnp.array_equal(full, jax.jit(hat_banded_T)(src, pos)))
    res["bandedTsel_equal_full"] = bool(
        jnp.array_equal(full, jax.jit(hat_banded_T_selectn)(src, pos))
    )
    return res


# ---------------- quad sub-stages ----------------
def bench_quad(iters):
    from chessvision_tpu.ops.quad import connected_component, decimate_to_quad, support_points

    B, H, W = 128, 256, 256
    key = jax.random.PRNGKey(2)
    yy = jnp.linspace(-1, 1, H)[None, :, None]
    xx = jnp.linspace(-1, 1, W)[None, None, :]
    probs = jnp.broadcast_to(
        jax.nn.sigmoid(8.0 * (0.6 - jnp.maximum(jnp.abs(yy), jnp.abs(xx)))), (B, H, W)
    )
    mask = probs > 0.5

    def smooth_2d(p):
        return lax.reduce_window(p, 0.0, lax.add, (1, 9, 9), (1, 1, 1), "SAME")

    def smooth_sep(p):
        s = lax.reduce_window(p, 0.0, lax.add, (1, 9, 1), (1, 1, 1), "SAME")
        return lax.reduce_window(s, 0.0, lax.add, (1, 1, 9), (1, 1, 1), "SAME")

    def flood(m):
        ms = m.reshape(B, H // 2, 2, W // 2, 2).any(axis=(2, 4))
        seeds = jnp.full((B,), (H // 4) * (W // 2) + W // 4, jnp.int32)
        return jax.vmap(lambda mm, s: connected_component(mm, s))(ms, seeds)

    def supdec(m):
        pts = jax.vmap(support_points)(m)
        return jax.vmap(decimate_to_quad)(pts)

    res = {}
    res["smooth_9x9_2d"] = timeit(jax.jit(lambda p: smooth_2d(p)), probs, iters=iters)
    res["smooth_9x9_sep"] = timeit(jax.jit(smooth_sep), probs, iters=iters, name="smooth_9x9_sep")
    res["flood_halfres"] = timeit(jax.jit(flood), mask, iters=iters, name="flood_halfres")
    res["support_decimate"] = timeit(jax.jit(supdec), mask, iters=iters, name="support_decimate")
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--which", default="all")
    p.add_argument("--iters", type=int, default=5)
    a = p.parse_args()
    out = {"backend": jax.default_backend()}
    if a.which in ("warp", "all"):
        out.update(bench_warp(a.iters))
        print(json.dumps(out), file=sys.stderr)
    if a.which in ("quad", "all"):
        out.update(bench_quad(a.iters))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
