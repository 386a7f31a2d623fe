"""Flax ResNet piece classifier.

Matches the reference's timm resnet18 configuration — ``num_classes=13,
in_chans=1`` (reference utils.py:32-39) — in a TPU-idiomatic NHWC/bf16
formulation.  Input is (B, 64, 64, 1) normalized squares; output is
(B, 13) logits.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    channels: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=self.strides, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="bn2")(y)
        if residual.shape[-1] != self.channels or self.strides != 1:
            residual = nn.Conv(self.channels, (1, 1), strides=self.strides, use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="down_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-18/34-style classifier (BasicBlock stages)."""

    num_classes: int = 13
    in_channels: int = 1
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, return_features: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, blocks in enumerate(self.stage_sizes):
            channels = self.width * (2**i)
            for j in range(blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock(channels, strides, dtype=self.dtype, name=f"layer{i + 1}_{j}")(x, train)
        features = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(features)
        if return_features:
            # embedding tap — the analogue of the reference's hidden-layer
            # hook at module index 90 (train_classifier.py:32, 212-215)
            return logits, features
        return logits


def resnet18(
    num_classes: int = 13, in_channels: int = 1, width: int = 64, dtype: Any = jnp.bfloat16
) -> ResNet:
    return ResNet(
        num_classes=num_classes,
        in_channels=in_channels,
        stage_sizes=(2, 2, 2, 2),
        width=width,
        dtype=dtype,
    )
