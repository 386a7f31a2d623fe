"""Perspective transform: homography solve + bilinear warp gather.

Replaces cv2.getPerspectiveTransform + cv2.warpPerspective (reference
utils.py:115-132).  The 3×3 homography comes from the standard 8×8 DLT
system solved on device (tiny, per image); the warp is a vectorized
bilinear gather over the source image with zero border, evaluated for all
output pixels at once — batched over boards with ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _basis_homography(pts: jnp.ndarray) -> jnp.ndarray:
    """Closed-form homography mapping the projective basis e1, e2, e3,
    (1,1,1) to the 4 points (x_i, y_i, 1): columns of [p1 p2 p3] scaled by
    the adjugate solve of p4.  No LU factorization — 3×3 adjugate only
    (jnp.linalg.solve compiled for minutes on the TPU backend)."""
    # m columns are p1, p2, p3 as homogeneous vectors
    m = jnp.stack(
        [
            jnp.array([pts[0, 0], pts[1, 0], pts[2, 0]]),
            jnp.array([pts[0, 1], pts[1, 1], pts[2, 1]]),
            jnp.ones((3,)),
        ],
        axis=0,
    ).astype(jnp.float32)
    p4 = jnp.array([pts[3, 0], pts[3, 1], 1.0], jnp.float32)
    adj = _adjugate(m)
    scale = adj @ p4  # solves m @ scale = det * p4
    return m * scale[None, :]


def _adjugate(m: jnp.ndarray) -> jnp.ndarray:
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    return jnp.array(
        [
            [e * i - f * h, c * h - b * i, b * f - c * e],
            [f * g - d * i, a * i - c * g, c * d - a * f],
            [d * h - e * g, b * g - a * h, a * e - b * d],
        ]
    )


def get_perspective_transform(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Homography M (3, 3) mapping src[i] → dst[i] for 4 point pairs,
    normalized so M[2, 2] = 1 — same result as cv2.getPerspectiveTransform,
    computed in closed form (basis-homography composition) instead of an
    8×8 linear solve: H = B_dst · adj(B_src), pure elementwise 3×3 algebra
    that vmaps/compiles in milliseconds."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    h_src = _basis_homography(src)
    h_dst = _basis_homography(dst)
    m = h_dst @ _adjugate(h_src)
    return m / m[2, 2]


def invert_homography(m: jnp.ndarray) -> jnp.ndarray:
    """3×3 inverse via the adjugate (no pivoting needed at this size)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    ai = e * i - f * h
    bi = c * h - b * i
    ci = b * f - c * e
    di = f * g - d * i
    ei = a * i - c * g
    fi = c * d - a * f
    gi = d * h - e * g
    hi = b * g - a * h
    ii = a * e - b * d
    det = a * ai + b * di + c * gi
    adj = jnp.array([[ai, bi, ci], [di, ei, fi], [gi, hi, ii]])
    return adj / det


def _warp_batched(imgs: jnp.ndarray, ms: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Warp (B, H, W) float images by (B, 3, 3) homographies (src→dst),
    sampling dst pixel (x, y) at M⁻¹·(x, y, 1) with bilinear interpolation
    and zero border — cv2.warpPerspective default semantics.

    TPU note: the bilinear fetch is expressed as ONE flat
    ``take_along_axis`` gather per image over the flattened source (4
    taps concatenated), which XLA lowers to an efficient single-axis
    gather.  Per-pixel 2-D advanced indexing under vmap instead produced a
    pathological multi-minute-compile, seconds-to-run gather HLO.
    """
    b, src_h, src_w = imgs.shape
    minv = jax.vmap(invert_homography)(ms)  # (B, 3, 3)

    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    mi = minv[:, :, :, None, None]  # (B, 3, 3, 1, 1)
    denom = mi[:, 2, 0] * xs + mi[:, 2, 1] * ys + mi[:, 2, 2]
    sx = (mi[:, 0, 0] * xs + mi[:, 0, 1] * ys + mi[:, 0, 2]) / denom  # (B, oh, ow)
    sy = (mi[:, 1, 0] * xs + mi[:, 1, 1] * ys + mi[:, 1, 2]) / denom

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = imgs.reshape(b, src_h * src_w)
    n = out_h * out_w

    weights = [
        ((0, 0), (1.0 - fx) * (1.0 - fy)),
        ((0, 1), fx * (1.0 - fy)),
        ((1, 0), (1.0 - fx) * fy),
        ((1, 1), fx * fy),
    ]
    idx_list = []
    valid_list = []
    for (dy, dx), _ in weights:
        yi = y0i + dy
        xi = x0i + dx
        valid = (xi >= 0) & (xi < src_w) & (yi >= 0) & (yi < src_h)
        fidx = jnp.clip(yi, 0, src_h - 1) * src_w + jnp.clip(xi, 0, src_w - 1)
        idx_list.append(fidx.reshape(b, n))
        valid_list.append(valid)
    all_idx = jnp.concatenate(idx_list, axis=1)  # (B, 4n)
    vals = jnp.take_along_axis(flat, all_idx, axis=1)  # one gather
    out = jnp.zeros((b, out_h, out_w), jnp.float32)
    for t, ((_, __), w) in enumerate(weights):
        v = vals[:, t * n : (t + 1) * n].reshape(b, out_h, out_w)
        out = out + jnp.where(valid_list[t], v, 0.0) * w
    return out


def _pallas_eligible(src: jnp.ndarray, pos: jnp.ndarray) -> bool:
    """Whether to route through the banded Pallas kernel.

    Opt-in via CVTPU_PALLAS_WARP=1: measured on v5e (B=128, 512²), XLA's
    fused multiply-reduce runs the full-width contraction in 59 ms while
    the banded Pallas variants measured 68–80 ms — Mosaic's code for the
    switch-selected band doesn't beat XLA's fusion here, so the kernel
    stays an optional path pending further tuning."""
    import os

    if os.getenv("CVTPU_PALLAS_WARP") != "1":
        return False
    try:
        import jax

        if jax.default_backend() != "tpu":
            return False
    except Exception:  # noqa: BLE001
        return False
    from chessvision_tpu.ops import pallas_kernels as pk

    n = 1
    for d in src.shape[:-1]:
        n *= d
    j = src.shape[-1]
    u = pos.shape[-1]
    return n % pk.ROW_BLOCK == 0 and u % pk.U_TILE == 0 and j >= pk.WINDOW and j % pk.QUANT == 0


def _hat_resample_dispatch(src: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """(..., J) rows resampled at (..., U) positions; banded Pallas kernel
    on TPU, fused XLA multiply-reduce elsewhere."""
    if _pallas_eligible(src, pos):
        from chessvision_tpu.ops.pallas_kernels import banded_resample

        lead = src.shape[:-1]
        out = banded_resample(
            src.reshape(-1, src.shape[-1]), pos.reshape(-1, pos.shape[-1])
        )
        return out.reshape(*lead, pos.shape[-1])
    return _hat_resample_last_axis(src, pos)


def _hat_resample_last_axis(src: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """1-D linear resample along the last axis with per-row positions.

    ``src`` (..., J), ``pos`` (..., U) → (..., U): out[..., u] =
    Σ_j max(0, 1 − |pos[..., u] − j|) · src[..., j].

    Evaluated as a fused broadcast-multiply-reduce instead of a gather:
    TPU per-lane gathers run at scalar speed, while this form streams on
    the VPU and XLA fuses the hat-weight generation into the reduction.
    Out-of-range positions contribute zero weight — constant(0) border.

    Axis layout: the contraction axis J sits second-to-last and the output
    axis U last, so the reduction accumulates across sublane tiles while
    outputs stay on vector lanes — measured ~6% faster than reducing over
    the lane axis, and bit-identical (≤2 terms of the sum are nonzero, so
    any summation order gives the same float).
    """
    j = src.shape[-1]
    jj = jnp.arange(j, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None, :] - jj[:, None]))  # (..., J, U)
    return jnp.sum(w * src[..., :, None], axis=-2)


def _warp_batched_twopass(imgs: jnp.ndarray, ms: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Catmull–Smith two-pass projective warp of (B, H, W) by (B, 3, 3)
    src→dst homographies — gather-free, VPU/MXU-friendly.

    Pass 1 resamples each source row y horizontally at hx(u, y) = X(u, v*)
    where v* solves Y(u, v*) = y; pass 2 resamples each column vertically
    at Y(u, v).  The composite samples src exactly along the inverse-mapped
    positions; reconstruction differs from one-shot bilinear only in the
    interpolation footprint (sub-level differences on natural images).

    Caveat (Catmull–Smith bottleneck): homographies whose rotation
    component approaches ±90° make pass 1 ill-conditioned (den_v → 0) and
    the output collapses.  The engine never produces such homographies —
    quadrangle corner ordering (ops/quad.py order_like_reference) bounds
    the rotation to roughly ±45°, where this path is accurate (verified in
    tests) — but arbitrary-matrix callers should use method='bilinear'
    for near-axis-swapping transforms.
    """
    b, src_h, src_w = imgs.shape
    minv = jax.vmap(invert_homography)(ms)  # (B, 3, 3)
    a_, b_, c_ = minv[:, 0, 0], minv[:, 0, 1], minv[:, 0, 2]
    d_, e_, f_ = minv[:, 1, 0], minv[:, 1, 1], minv[:, 1, 2]
    g_, h_, i_ = minv[:, 2, 0], minv[:, 2, 1], minv[:, 2, 2]

    def bc(t: jnp.ndarray) -> jnp.ndarray:  # (B,) → (B, 1, 1)
        return t[:, None, None]

    # pass-1 positions hx over (B, y=src_h, u=out_w)
    ys = jax.lax.broadcasted_iota(jnp.float32, (src_h, out_w), 0)
    us = jax.lax.broadcasted_iota(jnp.float32, (src_h, out_w), 1)
    den_v = bc(e_) - ys * bc(h_)
    v_star = (ys * (bc(g_) * us + bc(i_)) - bc(d_) * us - bc(f_)) / jnp.where(
        jnp.abs(den_v) < 1e-8, 1e-8, den_v
    )
    den_x = bc(g_) * us + bc(h_) * v_star + bc(i_)
    hx = (bc(a_) * us + bc(b_) * v_star + bc(c_)) / jnp.where(
        jnp.abs(den_x) < 1e-8, 1e-8, den_x
    )
    tmp = _hat_resample_dispatch(imgs, hx)  # (B, src_h, out_w)

    # pass-2 positions Y over (B, u=out_w, v=out_h), resampling tmp columns
    vs = jax.lax.broadcasted_iota(jnp.float32, (out_w, out_h), 1)
    uu = jax.lax.broadcasted_iota(jnp.float32, (out_w, out_h), 0)
    den = bc(g_) * uu + bc(h_) * vs + bc(i_)
    vy = (bc(d_) * uu + bc(e_) * vs + bc(f_)) / jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
    tmp_t = tmp.transpose(0, 2, 1)  # (B, out_w, src_h)
    out_t = _hat_resample_dispatch(tmp_t, vy)  # (B, out_w, out_h)
    return out_t.transpose(0, 2, 1)


def warp_perspective(
    img: jnp.ndarray,
    m: jnp.ndarray,
    out_size: tuple[int, int],
    *,
    round_uint8: bool = False,
    method: str = "twopass",
) -> jnp.ndarray:
    """Warp image(s) to ``out_size = (width, height)`` (cv2 argument order).

    Accepts (H, W[, C]) with a (3, 3) homography, or batched (B, H, W[, C])
    with (B, 3, 3); float32 math, optional uint8 rounding at the end.
    Channels fold into the batch dimension.

    ``method``: 'twopass' (default — gather-free Catmull–Smith, the fast
    TPU path) or 'bilinear' (one-shot bilinear via a flat gather — exact
    cv2.warpPerspective arithmetic, used for parity tests).
    """
    out_w, out_h = out_size
    imgf = img.astype(jnp.float32)
    mf = m.astype(jnp.float32)

    single = imgf.ndim == 2 or (imgf.ndim == 3 and mf.ndim == 2)
    if single:
        imgf = imgf[None]
        mf = mf[None]

    kernel = _warp_batched_twopass if method == "twopass" else _warp_batched

    has_channels = imgf.ndim == 4
    if has_channels:
        b, h, w, c = imgf.shape
        # (B, H, W, C) → (B*C, H, W) with matching homography repetition
        imgs_flat = imgf.transpose(0, 3, 1, 2).reshape(b * c, h, w)
        ms_flat = jnp.repeat(mf, c, axis=0)
        out = kernel(imgs_flat, ms_flat, out_h, out_w)
        out = out.reshape(b, c, out_h, out_w).transpose(0, 2, 3, 1)
    else:
        out = kernel(imgf, mf, out_h, out_w)

    if single:
        out = out[0]
    if round_uint8:
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    return out
