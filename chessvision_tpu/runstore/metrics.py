"""Per-sample metrics collectors.

The 3LC-collector capability set used by the reference trainers:
 - per-sample unreduced segmentation loss (unet_loss_collector.py:19-48)
 - segmentation quality vs targets (SegmentationMetricsCollector)
 - classification metrics: loss / predicted / confidence
   (ClassificationMetricsCollector, train_classifier.py:211)
 - embeddings from a tapped layer (EmbeddingsMetricsCollector at layer
   52/90 — here the models expose a ``return_features`` tap / the UNet
   bottleneck), reduced to 2-D by ``Run.reduce_embeddings``
 - custom functional collectors: top-2 margin + entropy
   (train_yolo_classifier.py:18-36)

Collectors are plain functions over batched device outputs — they run
under jit inside the evaluation pass and the host only receives small
per-sample vectors.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from chessvision_tpu.train import losses


def segmentation_loss_per_sample(logits: jnp.ndarray, targets: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """BCE + dice per sample (LossCollector.compute_metrics semantics)."""
    bce = losses.bce_with_logits_per_sample(logits, targets)
    dice = losses.dice_loss_per_sample(jax.nn.sigmoid(logits), targets)
    return {"loss": bce + dice, "bce": bce, "dice_loss": dice}


def segmentation_quality(logits: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5) -> dict[str, jnp.ndarray]:
    """Per-sample IoU / pixel accuracy of the thresholded mask."""
    pred = (jax.nn.sigmoid(logits) > threshold).astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * targets, axis=axes)
    union = jnp.sum(jnp.maximum(pred, targets), axis=axes)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 1.0)
    acc = jnp.mean((pred == targets).astype(jnp.float32), axis=axes)
    return {"iou": iou, "pixel_accuracy": acc}


def classification_metrics(logits: jnp.ndarray, labels: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-sample CE loss, prediction, confidence, correctness."""
    import optax

    probs = jax.nn.softmax(logits, axis=-1)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    pred = jnp.argmax(logits, axis=-1)
    return {
        "loss": loss,
        "predicted": pred.astype(jnp.int32),
        "confidence": jnp.max(probs, axis=-1),
        "correct": (pred == labels).astype(jnp.int32),
    }


def top2_margin_and_entropy(probs: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """The reference's custom YOLO collector (train_yolo_classifier.py:18-24):
    difference between top-2 probabilities + prediction entropy."""
    top2 = jax.lax.top_k(probs, 2)[0]
    margin = top2[..., 0] - top2[..., 1]
    entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12, 1.0)), axis=-1)
    return {"top_2_confidence_difference": margin, "prediction_entropy": entropy}


def to_numpy(metrics: dict[str, Any]) -> dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in metrics.items()}
