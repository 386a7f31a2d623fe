"""Area/bilinear resize as separable matrix multiplication.

Replaces ``cv2.resize(..., interpolation=cv2.INTER_AREA)`` on the hot path
(reference core.py:212).  A separable resize is two small matmuls —
``out = W_h @ img @ W_w^T`` — which XLA tiles straight onto the MXU and fuses
with the surrounding pipeline, instead of OpenCV's scalar C++ loops on host.

Semantics match OpenCV:
- downscale: pixel-area relation (exact box overlap weights),
- upscale / identity: bilinear (cv2 falls back to bilinear for INTER_AREA
  upscaling), with half-pixel centers ``src = (dst + 0.5) * scale - 0.5``.

The weight matrices depend only on the (static) shapes, so they are computed
once on host per shape and become constants inside the jitted pipeline.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _area_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) box-overlap weight matrix for area downscaling."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float32)
    for o in range(dst):
        start = o * scale
        end = (o + 1) * scale
        s0 = int(np.floor(start))
        s1 = int(np.ceil(end))
        for s in range(s0, min(s1, src)):
            overlap = min(end, s + 1) - max(start, s)
            if overlap > 0:
                w[o, s] = overlap / scale
    return w


def _bilinear_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear weight matrix with half-pixel centers."""
    scale = src / dst
    w = np.zeros((dst, src), dtype=np.float32)
    for o in range(dst):
        x = (o + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        xa = min(max(x0, 0), src - 1)
        xb = min(max(x0 + 1, 0), src - 1)
        w[o, xa] += 1.0 - frac
        w[o, xb] += frac
    return w


@lru_cache(maxsize=64)
def resize_matrices(
    src_h: int, src_w: int, dst_h: int, dst_w: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-axis resize weight matrices (W_h: (dst_h, src_h), W_w: (dst_w, src_w)).

    Area weights per axis when that axis shrinks, bilinear otherwise
    (matching cv2.INTER_AREA's behaviour per overall scale; for the mixed
    case OpenCV's behaviour is area-based — we use area on the shrinking
    axis which coincides for the uniform scales this pipeline uses).
    """
    wh = _area_weights(src_h, dst_h) if dst_h < src_h else _bilinear_weights(src_h, dst_h)
    ww = _area_weights(src_w, dst_w) if dst_w < src_w else _bilinear_weights(src_w, dst_w)
    return wh, ww


def resize(
    img: jnp.ndarray,
    dst_hw: tuple[int, int],
    *,
    round_uint8: bool = False,
) -> jnp.ndarray:
    """Resize image(s) to ``dst_hw = (height, width)``.

    Accepts (H, W), (H, W, C), (B, H, W) or (B, H, W, C) arrays of any real
    dtype; computes in float32.  With ``round_uint8`` the result is rounded
    (half-to-even, like cv2's saturate_cast) and returned as uint8, exactly
    matching the reference's resize-then-normalize ordering (core.py:212-215).
    """
    dst_h, dst_w = dst_hw
    squeeze_batch = img.ndim in (2, 3) and (img.ndim == 2 or img.shape[-1] <= 4)
    # Normalize to (B, H, W, C)
    if img.ndim == 2:
        x = img[None, :, :, None]
    elif img.ndim == 3:
        if img.shape[-1] <= 4:  # (H, W, C)
            x = img[None]
        else:  # (B, H, W)
            x = img[..., None]
            squeeze_batch = False
    else:
        x = img

    b, src_h, src_w, c = x.shape

    # Fast path: integer-factor area downscale with a power-of-two pixel
    # count per box.  The box weights are uniform (each output pixel covers
    # exactly fh×fw source pixels), so the resize is a reshape + sum + one
    # exact power-of-two scale — pure VPU streaming, no MXU contraction.
    # Bit-identical to the matmul path: the ≤2^16 integer partial sums and
    # the 2^-k scale are exact in float32.  This is the production 512→256
    # case (constants.INPUT_SIZE); measured 35 ms → ~2 ms at B=128 on v5e
    # vs the HIGHEST-precision einsum pair.
    if (
        dst_h < src_h
        and dst_w < src_w
        and src_h % dst_h == 0
        and src_w % dst_w == 0
        and ((src_h // dst_h) * (src_w // dst_w)) & ((src_h // dst_h) * (src_w // dst_w) - 1) == 0
    ):
        fh, fw = src_h // dst_h, src_w // dst_w
        xf = x.astype(jnp.float32).reshape(b, dst_h, fh, dst_w, fw, c)
        out = xf.sum(axis=(2, 4)) * jnp.float32(1.0 / (fh * fw))
        if round_uint8:
            out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)
        if squeeze_batch:
            out = out[0]
            if img.ndim == 2:
                out = out[..., 0]
        elif img.ndim == 3 and img.shape[-1] > 4:
            out = out[..., 0]
        return out

    wh, ww = resize_matrices(src_h, src_w, dst_h, dst_w)
    wh_j = jnp.asarray(wh)
    ww_j = jnp.asarray(ww)

    xf = x.astype(jnp.float32)
    # (B,H,W,C): contract H with W_h then W with W_w — two MXU matmuls.
    # HIGHEST precision: on TPU the default matmul precision truncates
    # operands to bf16 (8 mantissa bits), which loses the low bit of
    # 0.5·uint8 products and shifts the result by ±1 gray level — enough to
    # flip marginal mask pixels downstream and move quadrangle corners.
    # With f32 accumulation the integer-factor area resize is exact (and
    # matches the cv2-golden CPU tests bit-for-bit on TPU as well).
    out = jnp.einsum(
        "hs,bswc->bhwc",
        wh_j,
        xf,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "wt,bhtc->bhwc",
        ww_j,
        out,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    if round_uint8:
        # cv2 saturate_cast on the integer path rounds half away from zero;
        # floor(x + 0.5) matches it bit-for-bit for integer scale factors.
        out = jnp.clip(jnp.floor(out + 0.5), 0, 255).astype(jnp.uint8)

    if squeeze_batch:
        out = out[0]
        if img.ndim == 2:
            out = out[..., 0]
    elif img.ndim == 3 and img.shape[-1] > 4:
        out = out[..., 0]
    return out
