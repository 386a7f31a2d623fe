"""Loss functions.

Ports the semantics of the reference's segmentation objective — BCE-with-
logits plus dice loss (reference train_unet.py:309-317, which calls the
milesial ``dice_loss(sigmoid(pred), target, multiclass=False,
reduce_batch_first=False)``) — and the classifier's cross entropy
(train_classifier.py:220).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross entropy from logits (torch BCEWithLogitsLoss)."""
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def dice_coefficient(
    probs: jnp.ndarray,
    targets: jnp.ndarray,
    *,
    epsilon: float = 1e-6,
    reduce_batch_first: bool = False,
) -> jnp.ndarray:
    """Dice coefficient with milesial semantics: per-item over all
    non-batch dims (reduce_batch_first=False), then averaged."""
    axes = tuple(range(1, probs.ndim)) if not reduce_batch_first else tuple(range(probs.ndim))
    inter = 2.0 * jnp.sum(probs * targets, axis=axes)
    sets_sum = jnp.sum(probs, axis=axes) + jnp.sum(targets, axis=axes)
    sets_sum = jnp.where(sets_sum == 0, inter, sets_sum)
    return jnp.mean((inter + epsilon) / (sets_sum + epsilon))


def dice_loss(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - dice_coefficient(probs, targets)


def dice_loss_per_sample(probs: jnp.ndarray, targets: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Unreduced per-sample dice loss — the reference's per-sample metrics
    collector variant (unet_loss_collector.py:32-38)."""
    axes = tuple(range(1, probs.ndim))
    inter = 2.0 * jnp.sum(probs * targets, axis=axes)
    sets_sum = jnp.sum(probs, axis=axes) + jnp.sum(targets, axis=axes)
    sets_sum = jnp.where(sets_sum == 0, inter, sets_sum)
    return 1.0 - (inter + epsilon) / (sets_sum + epsilon)


def bce_with_logits_per_sample(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    axes = tuple(range(1, logits.ndim))
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean(axis=axes)


def segmentation_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """BCE + dice, exactly the reference's training objective."""
    import jax

    return bce_with_logits(logits, targets) + dice_loss(jax.nn.sigmoid(logits), targets)


def cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, label_smoothing: float = 0.0
) -> jnp.ndarray:
    """Mean softmax cross entropy with integer labels, optional smoothing."""
    if label_smoothing > 0.0:
        n = logits.shape[-1]
        one_hot = jax.nn.one_hot(labels, n)
        targets = one_hot * (1.0 - label_smoothing) + label_smoothing / n
        return optax.softmax_cross_entropy(logits, targets).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
