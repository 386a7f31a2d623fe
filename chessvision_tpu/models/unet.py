"""Flax UNet for board segmentation.

Architecture-compatible with the reference's milesial-style UNet
(reference train_unet.py:461-465, core.py:88: ``UNet(n_channels=3,
n_classes=1, bilinear=False)``): DoubleConv stem, 4 Down stages, 4 Up
stages (transposed-conv or bilinear), 1×1 output head.  Differences are
TPU-idiomatic, not architectural: NHWC layout, bf16 compute with f32
params (no GradScaler needed on TPU), and BatchNorm running stats in a
``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="bn2")(x)
        return nn.relu(x)


class Down(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels, dtype=self.dtype, name="conv")(x, train)


def _align_corners_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix with torch align_corners=True
    semantics: output i samples input coordinate i*(n_in-1)/(n_out-1)."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        w[:, 0] = 1.0
        return w
    coords = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.minimum(coords.astype(np.int64), n_in - 2)
    frac = (coords - lo).astype(np.float32)
    w[np.arange(n_out), lo] = 1.0 - frac
    w[np.arange(n_out), lo + 1] = frac
    return w


def _bilinear_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2× bilinear upsampling with align_corners=True (torch ``Upsample``
    semantics used by the reference's bilinear UNet variant,
    reference train_unet.py:461-465).  Separable 1-D interpolation
    expressed as two small matmuls (MXU-friendly; static shapes), since
    jax.image.resize(method='linear') uses half-pixel centers
    (align_corners=False) and diverges from torch near the edges."""
    b, h, w, c = x.shape
    wh = jnp.asarray(_align_corners_weights(h, 2 * h), x.dtype)
    ww = jnp.asarray(_align_corners_weights(w, 2 * w), x.dtype)
    x = jnp.einsum("Hh,bhwc->bHwc", wh, x)
    return jnp.einsum("Ww,bhwc->bhWc", ww, x)


class Up(nn.Module):
    out_channels: int
    bilinear: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_channels = x1.shape[-1] + x2.shape[-1]
        if self.bilinear:
            x1 = _bilinear_upsample_2x(x1)
            mid = in_channels // 2
        else:
            x1 = nn.ConvTranspose(
                x1.shape[-1] // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="up"
            )(x1)
            in_channels = x1.shape[-1] + x2.shape[-1]
            mid = None
        # pad x1 to x2's spatial dims (only needed for non-power-of-two inputs)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_channels, mid_channels=mid, dtype=self.dtype, name="conv")(x, train)


class UNet(nn.Module):
    """UNet(n_channels → n_classes) over NHWC inputs in [0, 1]."""

    n_channels: int = 3
    n_classes: int = 1
    bilinear: bool = False
    base: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_features: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        factor = 2 if self.bilinear else 1
        b = self.base
        x = x.astype(self.dtype)
        x1 = DoubleConv(b, dtype=self.dtype, name="inc")(x, train)
        x2 = Down(b * 2, dtype=self.dtype, name="down1")(x1, train)
        x3 = Down(b * 4, dtype=self.dtype, name="down2")(x2, train)
        x4 = Down(b * 8, dtype=self.dtype, name="down3")(x3, train)
        x5 = Down(b * 16 // factor, dtype=self.dtype, name="down4")(x4, train)
        x = Up(b * 8 // factor, self.bilinear, dtype=self.dtype, name="up1")(x5, x4, train)
        x = Up(b * 4 // factor, self.bilinear, dtype=self.dtype, name="up2")(x, x3, train)
        x = Up(b * 2 // factor, self.bilinear, dtype=self.dtype, name="up3")(x, x2, train)
        x = Up(b, self.bilinear, dtype=self.dtype, name="up4")(x, x1, train)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="outc")(x)
        if return_features:
            # pooled bottleneck embedding — the analogue of the reference's
            # module-index-52 hook (train_unet.py:210-211)
            features = jnp.mean(x5, axis=(1, 2)).astype(jnp.float32)
            return logits.astype(jnp.float32), features
        return logits.astype(jnp.float32)
