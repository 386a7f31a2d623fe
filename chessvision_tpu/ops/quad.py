"""On-device quadrangle extraction from binary masks.

Replaces the reference's host-side OpenCV stage — cv2.findContours +
contour filters + approxPolyDP + orientation normalization (reference
core.py:357-417) — with a fixed-shape, jittable, batched formulation:

1. **Dominant component** (replaces RETR_CCOMP contour selection): flood
   fill from the highest-probability pixel using log-depth *segmented
   reachability scans* along rows and columns (``lax.associative_scan``
   with an or-with-reset monoid).  For convex board blobs two row/col
   rounds reach every pixel; a few extra rounds handle ragged masks.
   No sequential border tracing, no data-dependent shapes.

2. **Contour filters** (reference core.py:381-404): component pixel area
   within [0.35, 1.0]·mask_area and bounding-box side ratio ≥ 0.6,
   evaluated with masked reductions.

3. **Corners** (replaces approxPolyDP at 10% arc length): the component's
   convex hull sampled as support points over K fixed directions (ordered
   by angle by construction), then Visvalingam–Whyatt decimation — remove
   the vertex with the smallest triangle area until 4 remain.  For
   quadrilateral blobs this converges to the same dominant corners the
   10%-arclength polygon simplification finds, but is a fixed-iteration
   loop over fixed-size arrays.

4. **Orientation normalization** (reference core.py:406-411): emit corners
   in OpenCV contour order (counter-clockwise in y-down image coords,
   starting topmost) and apply the same rotate-if-pt0.x<pt2.x rule.

Everything runs under ``jit``/``vmap``; a batch of masks goes in, a batch
of quads + found-flags comes out, with no host round-trip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Number of support directions for hull sampling.  64 (5.6° resolution)
# reproduces the cv2 oracle's corners EXACTLY on all 631 fixture masks
# (corner positions come from the support argmax, not the angular grid)
# while halving the serial decimation chain (60 steps).
NUM_DIRECTIONS = 64

# Rounds of row+column reachability propagation.  Convex blobs need 2;
# a third round absorbs ragged/noisy boundaries (validated against the
# cv2 oracle on all 631 fixture masks).
FLOOD_ROUNDS = 3

# Reference contour-filter thresholds (core.py:381-404).
MIN_AREA_PERCENTAGE = 0.35
MAX_AREA_PERCENTAGE = 1.0
# Floor for the dominant-component small-board fallback (see find_quadrangle):
# boards between 5% and 35% of the frame are accepted when the seeded
# component is essentially the whole foreground.
SMALL_BOARD_MIN_AREA = 0.05
MIN_RATIO_BOUNDING = 0.6


def _flood_pass_rows(mask: jnp.ndarray, visited: jnp.ndarray, run_id: jnp.ndarray) -> jnp.ndarray:
    """One bidirectional segmented-reachability pass along the LAST axis.

    A pixel becomes visited if some visited pixel lies in the same
    contiguous run of ``mask`` along the axis.  Two pixels share a run iff
    their run ids (count of zeros to their left, constant inside a run and
    distinct across runs) are equal, so the pass is one quadratic
    membership test — reach[.., j] = ∃i: visited[.., i] & mask[.., i] &
    run_id[.., i] == run_id[.., j] — a single fused broadcast-compare-
    reduce on the VPU.  This replaced a pair of log-depth
    ``lax.associative_scan``s (forward + reverse, 2-tuple state): the
    quadratic form is W×/run more raw ops but one kernel instead of ~14
    strided slice/concat steps per scan, and measures ~7× faster at the
    production half-resolution W=128 (21 ms → 3 ms per 128-mask batch).
    """
    vj = mask & visited
    eq = run_id[..., :, None] == run_id[..., None, :]  # (.., W_i, W_j)
    reach = jnp.any(eq & vj[..., :, None], axis=-2)  # (.., W_j)
    return visited | (mask & reach)


def connected_component(mask: jnp.ndarray, seed_flat: jnp.ndarray, rounds: int = FLOOD_ROUNDS) -> jnp.ndarray:
    """Pixels of ``mask`` (H, W) bool connected to the seed (flat index).

    Uses ``rounds`` alternating row/column reachability passes — exact for
    convex components, and convergent for mildly non-convex ones.
    """
    h, w = mask.shape
    visited = jnp.zeros((h * w,), jnp.bool_).at[seed_flat].set(True).reshape(h, w)
    visited = visited & mask

    # Run ids depend only on the mask — computed once, reused every round.
    mask_t = jnp.swapaxes(mask, -1, -2)
    run_rows = jnp.cumsum((~mask).astype(jnp.int32), axis=-1)
    run_cols = jnp.cumsum((~mask_t).astype(jnp.int32), axis=-1)

    def body(_, v):
        v = _flood_pass_rows(mask, v, run_rows)
        v_t = _flood_pass_rows(mask_t, jnp.swapaxes(v, -1, -2), run_cols)
        return jnp.swapaxes(v_t, -1, -2)

    return lax.fori_loop(0, rounds, body, visited)


def support_points(component: jnp.ndarray, k: int = NUM_DIRECTIONS) -> jnp.ndarray:
    """(k, 2) hull support points (x, y) of a bool (H, W) component, ordered
    by direction angle (one full turn), i.e. in hull-traversal order.

    The support of a pixel set in any direction is attained at one of the
    per-row extreme pixels (the projection is linear in x within a row),
    so the candidate set collapses from H·W pixels to 2·H row extremes.
    That turns the whole computation into two row reductions plus a tiny
    (2H, 2) × (2, k) matmul + argmax — dense, parallel, no per-direction
    serial scan (a lax.map over directions cost ~200 ms/batch on TPU)."""
    h, w = component.shape
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 20)
    min_x = jnp.min(jnp.where(component, xs, big), axis=1)  # (h,)
    max_x = jnp.max(jnp.where(component, xs, -big), axis=1)
    row_valid = jnp.any(component, axis=1)
    ys = jnp.arange(h, dtype=jnp.float32)

    cand = jnp.concatenate(
        [
            jnp.stack([min_x.astype(jnp.float32), ys], axis=1),
            jnp.stack([max_x.astype(jnp.float32), ys], axis=1),
        ],
        axis=0,
    )  # (2h, 2)
    valid = jnp.concatenate([row_valid, row_valid])

    thetas = jnp.arange(k, dtype=jnp.float32) * (2.0 * jnp.pi / k)
    dirs = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=0)  # (2, k)
    proj = cand @ dirs  # (2h, k)
    proj = jnp.where(valid[:, None], proj, jnp.float32(-3.0e8))
    idx = jnp.argmax(proj, axis=0)  # (k,)
    return cand[idx]  # (k, 2) as (x, y)


def decimate_to_quad(points: jnp.ndarray) -> jnp.ndarray:
    """Iterative decimation of a closed polygon (k, 2), in order, down to 4
    vertices: repeatedly remove the vertex with the smallest *deviation*
    (perpendicular distance to the chord between its active neighbours).

    The deviation criterion matches cv2.approxPolyDP's semantics — a thin
    protrusion's tip deviates little from its chord and is dropped early,
    while a true (possibly rounded) corner's surviving vertex accumulates
    deviation as its neighbours disappear.  (Visvalingam's triangle-area
    criterion is deviation × chord-length and wrongly favours spike tips
    sitting between far-apart neighbours.)  Returns (4, 2) in traversal
    order."""
    k = points.shape[0]
    idx = jnp.arange(k, dtype=jnp.int32)
    prv = jnp.roll(idx, 1)
    nxt = jnp.roll(idx, -1)
    active = jnp.ones((k,), jnp.bool_)
    big = jnp.float32(3.0e18)

    def deviations(prv, nxt, active):
        p = points
        a = p[prv]
        b = p
        c = p[nxt]
        cross = jnp.abs(
            (a[:, 0] - b[:, 0]) * (c[:, 1] - b[:, 1]) - (a[:, 1] - b[:, 1]) * (c[:, 0] - b[:, 0])
        )
        chord = jnp.sqrt(jnp.sum((c - a) ** 2, axis=1))
        dist = cross / jnp.maximum(chord, 1e-6)
        # Deterministic tie-break: prefer removing lower indices first.
        return jnp.where(active, dist + idx.astype(jnp.float32) * 1e-6, big)

    def body(_, state):
        prv, nxt, active = state
        devs = deviations(prv, nxt, active)
        r = jnp.argmin(devs)
        pr = prv[r]
        nx = nxt[r]
        active = active.at[r].set(False)
        nxt = nxt.at[pr].set(nx)
        prv = prv.at[nx].set(pr)
        return prv, nxt, active

    prv, nxt, active = lax.fori_loop(0, k - 4, body, (prv, nxt, active))

    # Walk the remaining 4-cycle starting from the smallest active index so
    # the output order is deterministic and follows hull traversal order.
    start = jnp.argmax(active)
    i0 = start
    i1 = nxt[i0]
    i2 = nxt[i1]
    i3 = nxt[i2]
    return points[jnp.stack([i0, i1, i2, i3])]


def order_like_reference(quad: jnp.ndarray) -> jnp.ndarray:
    """Normalize corner order to the reference's convention.

    Our hull traversal (direction angle 0→2π with y pointing down) is
    clockwise on screen; OpenCV traces outer contours counter-clockwise on
    screen, so reverse.  Start from the topmost corner (OpenCV's border
    following starts at the first boundary pixel in raster order), then
    apply the reference's rotate rule (core.py:406-411): if pt0.x < pt2.x,
    take order [3, 0, 1, 2].
    """
    q = quad[::-1]  # reverse traversal direction to match OpenCV

    # rotate so the topmost (then leftmost) corner is first
    score = q[:, 1] * 4096.0 + q[:, 0]
    start = jnp.argmin(score)
    idx = (jnp.arange(4) + start) % 4
    q = q[idx]

    rotated = q[jnp.array([3, 0, 1, 2])]
    return jnp.where(q[0, 0] < q[2, 0], rotated, q)


@partial(jax.jit, static_argnames=("k", "rounds"))
def find_quadrangle(
    probabilities: jnp.ndarray,
    threshold: float | jnp.ndarray = 0.5,
    k: int = NUM_DIRECTIONS,
    rounds: int = FLOOD_ROUNDS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find the board quadrangle in one probability mask (H, W) float.

    Returns (quad (4, 2) float32 in mask pixel coords, found bool).
    Mirrors reference process_board_extraction_logits geometry semantics
    (core.py:276-295) with the dominant component selected by the
    highest-probability seed.
    """
    h, w = probabilities.shape
    mask = probabilities > threshold

    # Seed = highest *locally-averaged* probability among foreground pixels,
    # so an isolated speck can never capture the seed even on hard binary
    # masks (the reference instead iterates all contours; we pick the
    # dominant component directly).
    smoothed = lax.reduce_window(
        probabilities, 0.0, lax.add, (9, 9), (1, 1), "SAME"
    )
    seed = jnp.argmax(jnp.where(mask, smoothed, -1.0).reshape(-1))

    # Component selection at half resolution: 2×2 OR-pooling preserves
    # connectivity (can only merge things ≤1 px apart), quarters the
    # flood-fill's HBM traffic/kernel count, and membership is restored
    # at full resolution by upsample+AND.  Oracle-validated on all 631
    # fixture masks.
    mask_small = mask.reshape(h // 2, 2, w // 2, 2).any(axis=(1, 3))
    seed_y, seed_x = seed // w, seed % w
    seed_small = (seed_y // 2) * (w // 2) + (seed_x // 2)
    comp_small = connected_component(mask_small, seed_small, rounds)
    comp = jnp.repeat(jnp.repeat(comp_small, 2, axis=0), 2, axis=1) & mask
    area = jnp.sum(comp, dtype=jnp.float32)
    foreground = jnp.sum(mask, dtype=jnp.float32)
    mask_area = jnp.float32(h * w)

    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 30)
    min_x = jnp.min(jnp.where(comp, xs, big))
    max_x = jnp.max(jnp.where(comp, xs, -big))
    min_y = jnp.min(jnp.where(comp, ys, big))
    max_y = jnp.max(jnp.where(comp, ys, -big))
    bb_w = (max_x - min_x + 1).astype(jnp.float32)
    bb_h = (max_y - min_y + 1).astype(jnp.float32)
    ratio = jnp.minimum(bb_w, bb_h) / jnp.maximum(jnp.maximum(bb_w, bb_h), 1.0)

    pts = support_points(comp, k)
    quad = decimate_to_quad(pts)
    quad = order_like_reference(quad)

    # Quad polygon area (shoelace) — used as a fit check: a component whose
    # hull-quad wildly over-covers its pixel area is not quadrilateral
    # (reference: approxPolyDP returned != 4 points → no board).
    x = quad[:, 0]
    y = quad[:, 1]
    quad_area = 0.5 * jnp.abs(jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y))

    # The reference applies the area/ratio filters only when MORE than one
    # contour exists (core.py:362-366); with a single clean blob any 4-gon
    # is accepted.  Device equivalent: filter only when the seeded
    # component does not cover the whole foreground.
    multiple = area < foreground
    filters_pass = (
        (area / mask_area >= MIN_AREA_PERCENTAGE)
        & (area / mask_area <= MAX_AREA_PERCENTAGE)
        & (ratio >= MIN_RATIO_BOUNDING)
    )
    # Deliberate improvement over the reference: its area filter
    # (core.py:381-404) rejects any board under 35% of the frame whenever a
    # single noise contour coexists — which fails exactly on small
    # digital-board diagrams embedded in pages (test image 16c72614: a
    # clean board mask at 23% of frame plus specks → the reference and the
    # strict filter both give up).  When the seeded component IS the
    # foreground (≥97% of lit pixels — i.e. everything else is specks),
    # accept boards down to 5% of the frame.  Square-ratio plus a
    # CONVEXITY gate keep bad segmentations out: a real board mask is a
    # filled quad (pixel area ≈ its support-polygon area, measured 1.00 on
    # the real small-board mask) while C/U-shaped blobs measure 0.55-0.66
    # — the decimated-4-gon fit alone cannot separate these (a C's 4-gon
    # hugs the ring at 1.12x its pixel area).
    hx = pts[:, 0]
    hy = pts[:, 1]
    hull_area = 0.5 * jnp.abs(jnp.sum(hx * jnp.roll(hy, -1) - jnp.roll(hx, -1) * hy))
    dominant = area >= 0.95 * foreground
    small_board_ok = (
        dominant
        & (area / mask_area >= SMALL_BOARD_MIN_AREA)
        & (ratio >= MIN_RATIO_BOUNDING)
        & (area >= 0.85 * hull_area)
    )
    found = (
        jnp.where(multiple, filters_pass | small_board_ok, True)
        & (quad_area <= 1.45 * area)
        & (area > 0)
    )
    return quad.astype(jnp.float32), found


def find_quadrangle_batch(
    probabilities: jnp.ndarray,
    threshold: float | jnp.ndarray = 0.5,
    k: int = NUM_DIRECTIONS,
    rounds: int = FLOOD_ROUNDS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ``find_quadrangle``: (B, H, W) → ((B, 4, 2), (B,))."""
    fn = lambda p: find_quadrangle(p, threshold, k, rounds)
    return jax.vmap(fn)(probabilities)


def scale_quadrangle(quad: jnp.ndarray, orig_h: jnp.ndarray | float, mask_h: int = 256) -> jnp.ndarray:
    """Scale mask-space quad to original-image coords.  The reference scales
    BOTH axes by orig_height/256 (core.py:413-417) — including its quirk of
    using the height factor for x — preserved for output parity."""
    sf = jnp.asarray(orig_h, jnp.float32) / jnp.float32(mask_h)
    return quad * sf
