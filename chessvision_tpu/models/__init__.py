"""Model zoo + registry.

The registry mirrors the reference's model-id semantics (reference
core.py:84-150): extractor ids {None/"unet", "yolo"}, classifier ids
{None/"yolo", "resnet18", ...}.  Every entry is a Flax module plus the
contract flags the engine needs (whether the model outputs probabilities
like the reference's YOLO wrapper, and its expected input size).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

from chessvision_tpu.models.resnet import ResNet, resnet18
from chessvision_tpu.models.unet import UNet
from chessvision_tpu.models.yolo import YoloCls, YoloSeg

__all__ = [
    "UNet",
    "ResNet",
    "resnet18",
    "YoloCls",
    "YoloSeg",
    "ModelSpec",
    "EXTRACTORS",
    "CLASSIFIERS",
    "create_extractor",
    "create_classifier",
]


@dataclass(frozen=True)
class ModelSpec:
    model_id: str
    build: Callable[..., nn.Module]
    input_size: tuple[int, int]
    in_channels: int
    outputs_probabilities: bool = False  # reference YOLO-cls returns probs


EXTRACTORS: dict[str, ModelSpec] = {
    "unet": ModelSpec("unet", lambda dtype=jnp.bfloat16, **kw: UNet(dtype=dtype, **kw), (256, 256), 3),
    "yolo": ModelSpec("yolo", lambda dtype=jnp.bfloat16, **kw: YoloSeg(dtype=dtype, **kw), (256, 256), 3),
}

CLASSIFIERS: dict[str, ModelSpec] = {
    "resnet18": ModelSpec(
        "resnet18", lambda dtype=jnp.bfloat16, **kw: resnet18(dtype=dtype, **kw), (64, 64), 1
    ),
    "yolo": ModelSpec(
        "yolo",
        lambda dtype=jnp.bfloat16, **kw: YoloCls(dtype=dtype, **kw),
        (64, 64),
        1,
        outputs_probabilities=True,
    ),
}


def create_extractor(model_id: str | None = None, **kwargs: Any) -> tuple[nn.Module, ModelSpec]:
    """Resolve an extractor model id (None → unet, like the reference's
    default UNet path, core.py:87-94)."""
    spec = EXTRACTORS[model_id or "unet"]
    return spec.build(**kwargs), spec


def create_classifier(model_id: str | None = None, **kwargs: Any) -> tuple[nn.Module, ModelSpec]:
    """Resolve a classifier model id (None → resnet18; the reference tries
    YOLO first then falls back to ResNet18, core.py:112-130 — here the
    native default is the ResNet since both are first-class)."""
    spec = CLASSIFIERS[model_id or "resnet18"]
    return spec.build(**kwargs), spec
