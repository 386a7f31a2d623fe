"""JAX stand-ins for the reference's YOLO model family.

The reference optionally swaps ultralytics YOLO models into the same
pipeline slots — yolov8-cls for 64×64 piece classification and yolo11s-seg
for 256×256 board segmentation (reference utils.py:190-280,
train_yolo_classifier.py, train_yolo_segmentation_model.py).  Porting
ultralytics is neither possible (torch) nor useful on TPU; instead these
are compact CSP/SiLU-style convnets with the same input/output contracts,
registered under the same model ids so every "--classifier-model-id yolo"
code path in training/eval/serving works identically (SURVEY.md §7 item e).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    channels: int
    strides: int = 1
    kernel: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.channels,
            (self.kernel, self.kernel),
            strides=self.strides,
            padding=self.kernel // 2,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=jnp.float32, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = ConvBlock(self.channels, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBlock(self.channels, dtype=self.dtype, name="cv2")(y, train)
        return x + y if x.shape[-1] == self.channels else y


class YoloCls(nn.Module):
    """yolov8n-cls-shaped classifier: stem + 4 stages + head.

    Input (B, 64, 64, C) in [0, 1]; output (B, num_classes) logits.
    """

    num_classes: int = 13
    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_features: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        w = self.width
        x = x.astype(self.dtype)
        x = ConvBlock(w, strides=2, dtype=self.dtype, name="stem")(x, train)  # 32
        for i, ch in enumerate([w * 2, w * 4, w * 8, w * 8]):
            x = ConvBlock(ch, strides=2, dtype=self.dtype, name=f"down{i}")(x, train)
            x = Bottleneck(ch, dtype=self.dtype, name=f"block{i}")(x, train)
        features = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(features)
        if return_features:
            return logits, features
        return logits


class YoloSeg(nn.Module):
    """yolo11s-seg-shaped binary segmenter: FPN-lite encoder/decoder.

    Input (B, 256, 256, 3) in [0, 1]; output (B, 256, 256, n_classes)
    logits — same contract as the UNet slot (the reference's YOLO wrapper
    returns per-pixel mask scores, utils.py:209-215).
    """

    n_classes: int = 1
    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.width
        x = x.astype(self.dtype)
        e1 = ConvBlock(w, strides=2, dtype=self.dtype, name="e1")(x, train)  # /2
        e2 = ConvBlock(w * 2, strides=2, dtype=self.dtype, name="e2")(e1, train)  # /4
        e2 = Bottleneck(w * 2, dtype=self.dtype, name="b2")(e2, train)
        e3 = ConvBlock(w * 4, strides=2, dtype=self.dtype, name="e3")(e2, train)  # /8
        e3 = Bottleneck(w * 4, dtype=self.dtype, name="b3")(e3, train)
        e4 = ConvBlock(w * 8, strides=2, dtype=self.dtype, name="e4")(e3, train)  # /16
        e4 = Bottleneck(w * 8, dtype=self.dtype, name="b4")(e4, train)

        def up2(t: jnp.ndarray) -> jnp.ndarray:
            b, h, ww_, c = t.shape
            t = jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
            return t

        d3 = ConvBlock(w * 4, dtype=self.dtype, name="d3")(jnp.concatenate([up2(e4), e3], -1), train)
        d2 = ConvBlock(w * 2, dtype=self.dtype, name="d2")(jnp.concatenate([up2(d3), e2], -1), train)
        d1 = ConvBlock(w, dtype=self.dtype, name="d1")(jnp.concatenate([up2(d2), e1], -1), train)
        d0 = ConvBlock(w, dtype=self.dtype, name="d0")(up2(d1), train)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="head")(d0)
        return logits.astype(jnp.float32)
