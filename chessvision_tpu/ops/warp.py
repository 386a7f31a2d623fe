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


def get_perspective_transform(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Solve the homography M (3, 3) mapping src[i] → dst[i] for 4 point
    pairs, with M[2, 2] = 1.  Same system as cv2.getPerspectiveTransform.

    Args:
        src: (4, 2) float source points (x, y).
        dst: (4, 2) float destination points.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    # Rows for u: [x y 1 0 0 0 -x*u -y*u]; rows for v: [0 0 0 x y 1 -x*v -y*v]
    a_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * u, -y * u], axis=1)
    a_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * v, -y * v], axis=1)
    a = jnp.concatenate([a_u, a_v], axis=0)  # (8, 8)
    b = jnp.concatenate([u, v], axis=0)  # (8,)
    coeffs = jnp.linalg.solve(a, b)
    m = jnp.concatenate([coeffs, jnp.ones((1,), jnp.float32)]).reshape(3, 3)
    return m


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


def _warp_single(img: jnp.ndarray, m: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Warp one (H, W) or (H, W, C) float image by homography m (src→dst),
    sampling dst pixel (x, y) at M⁻¹·(x, y, 1) with bilinear interpolation
    and zero border — cv2.warpPerspective default semantics."""
    src_h, src_w = img.shape[0], img.shape[1]
    minv = invert_homography(m)

    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    denom = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / denom
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / denom

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
        valid = (xi >= 0) & (xi < src_w) & (yi >= 0) & (yi < src_h)
        xc = jnp.clip(xi, 0, src_w - 1)
        yc = jnp.clip(yi, 0, src_h - 1)
        vals = img[yc, xc]
        if img.ndim == 3:
            valid = valid[..., None]
        return jnp.where(valid, vals, 0.0)

    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    if img.ndim == 3:
        w00, w01, w10, w11 = (w[..., None] for w in (w00, w01, w10, w11))

    out = (
        sample(y0i, x0i) * w00
        + sample(y0i, x0i + 1) * w01
        + sample(y0i + 1, x0i) * w10
        + sample(y0i + 1, x0i + 1) * w11
    )
    return out


def warp_perspective(
    img: jnp.ndarray,
    m: jnp.ndarray,
    out_size: tuple[int, int],
    *,
    round_uint8: bool = False,
) -> jnp.ndarray:
    """Warp image(s) to ``out_size = (width, height)`` (cv2 argument order).

    Accepts (H, W[, C]) with a (3, 3) homography, or batched (B, H, W[, C])
    with (B, 3, 3); float32 math, optional uint8 rounding at the end.
    """
    out_w, out_h = out_size
    batched = (img.ndim == 4) or (img.ndim == 3 and m.ndim == 3)
    imgf = img.astype(jnp.float32)
    if batched:
        out = jax.vmap(lambda i, mm: _warp_single(i, mm, out_h, out_w))(imgf, m)
    else:
        out = _warp_single(imgf, m, out_h, out_w)
    if round_uint8:
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
    return out
