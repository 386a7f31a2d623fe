"""Color conversion, thresholding, flips — elementwise VPU ops.

Replaces cv2.cvtColor(BGR2GRAY), cv2.flip and the mask thresholding helper
(reference core.py:299-300, utils.py:101-112).  All ops are jittable and
batched; XLA fuses them into the surrounding warp/classify stages so they
cost no extra HBM round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV's fixed-point BGR→gray: Y = (R*9798 + G*19235 + B*3735 + 2^14) >> 15
# (coefficients 0.299/0.587/0.114 scaled to sum exactly to 2^15).  The exact
# integer path gives bit-parity with the reference's uint8 boards.
_R_COEF = 9798
_G_COEF = 19235
_B_COEF = 3735
_SHIFT = 15


def bgr_to_gray(img: jnp.ndarray, *, exact_u8: bool = False) -> jnp.ndarray:
    """Convert (..., H, W, 3) BGR to (..., H, W) grayscale.

    With ``exact_u8`` the input must be uint8 and the result matches
    cv2.cvtColor bit-for-bit (integer fixed-point rounding); otherwise
    computes in float32 (fusable with the warp's bilinear math).
    """
    b = img[..., 0]
    g = img[..., 1]
    r = img[..., 2]
    if exact_u8:
        acc = (
            r.astype(jnp.int32) * _R_COEF
            + g.astype(jnp.int32) * _G_COEF
            + b.astype(jnp.int32) * _B_COEF
            + (1 << (_SHIFT - 1))
        )
        return (acc >> _SHIFT).astype(jnp.uint8)
    rf = r.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    return (rf * (_R_COEF / (1 << _SHIFT)) + gf * (_G_COEF / (1 << _SHIFT)) + bf * (_B_COEF / (1 << _SHIFT)))


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip (cv2.flip(img, 1)) along the width axis.

    Works for (..., H, W) and (..., H, W, C): flips the W axis.
    """
    axis = img.ndim - 1
    if img.shape[-1] <= 4 and img.ndim >= 3:
        axis = img.ndim - 2
    return jnp.flip(img, axis=axis)


def create_binary_mask(probabilities: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Probability mask → uint8 {0, 255} mask.  Strictly-greater comparison,
    matching reference utils.py:101-112."""
    return jnp.where(probabilities > threshold, jnp.uint8(255), jnp.uint8(0))
