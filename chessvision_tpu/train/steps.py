"""Sharded train/eval steps.

One jitted step per model family, data-parallel over a ``Mesh``: batch
sharded on the ``data`` axis, parameters/optimizer state replicated; the
gradient all-reduce is inserted by XLA from the sharding annotations —
no hand-written collectives (scaling-book recipe).  Replaces the
reference's torch loops (train_unet.py:289-329, train_classifier.py:63-111)
including gradient clipping; bf16 on TPU needs no GradScaler.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from chessvision_tpu.parallel import mesh as mesh_lib
from chessvision_tpu.train import losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn: Callable, params: Any, batch_stats: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads: Any, new_batch_stats: Any) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    kind: str,
    learning_rate: float | Callable,
    *,
    weight_decay: float = 0.0,
    momentum: float = 0.0,
    gradient_clipping: float | None = None,
) -> optax.GradientTransformation:
    """RMSprop (reference UNet trainer, train_unet.py:236-242) or Adam
    (classifier trainer, train_classifier.py:218), with optional global-norm
    clipping (train_unet.py:321)."""
    if kind == "rmsprop":
        core = optax.rmsprop(learning_rate, momentum=momentum, eps=1e-8)
    elif kind == "adam":
        core = optax.adam(learning_rate)
    else:
        raise ValueError(f"Unknown optimizer: {kind}")
    parts = []
    if gradient_clipping:
        parts.append(optax.clip_by_global_norm(gradient_clipping))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(core)
    return optax.chain(*parts)


def _shardings(mesh, state_like, batch_like):
    if mesh is None:
        return None, None
    rep = mesh_lib.replicate(mesh)
    state_s = jax.tree.map(lambda _: rep, state_like)
    batch_s = jax.tree.map(
        lambda x: mesh_lib.data_sharding(mesh, jnp.ndim(x)), batch_like
    )
    return state_s, batch_s


def make_seg_train_step(mesh=None) -> Callable:
    """Segmentation train step: BCE+dice on sigmoid logits, BN updates,
    batch DP-sharded over the mesh."""

    def step(state: TrainState, images: jnp.ndarray, masks: jnp.ndarray):
        def loss_fn(params):
            out, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            logits = out[..., 0]
            loss = losses.segmentation_loss(logits, masks)
            return loss, (updates["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        dice = losses.dice_coefficient(jax.nn.sigmoid(logits), masks)
        return new_state, {"loss": loss, "dice": dice}

    if mesh is None:
        return jax.jit(step)

    # Mesh path: constrain batch inputs to the data axis; params replicate.
    def sharded_step(state, images, masks):
        images = jax.lax.with_sharding_constraint(images, mesh_lib.data_sharding(mesh, images.ndim))
        masks = jax.lax.with_sharding_constraint(masks, mesh_lib.data_sharding(mesh, masks.ndim))
        return step(state, images, masks)

    return jax.jit(sharded_step)


def make_seg_eval_step() -> Callable:
    def step(state: TrainState, images: jnp.ndarray, masks: jnp.ndarray):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        probs = jax.nn.sigmoid(out[..., 0])
        # milesial evaluate(): dice on thresholded predictions
        return losses.dice_coefficient((probs > 0.5).astype(jnp.float32), masks)

    return jax.jit(step)


def make_cls_train_step(
    mesh=None, label_smoothing: float = 0.0, freeze_bn: bool = False
) -> Callable:
    """Classifier train step: cross entropy (optional smoothing) + top-1.

    ``freeze_bn`` runs BatchNorm in inference mode (frozen running stats)
    while still training the parameters — the standard fine-tune mode
    when resuming a converged model, whose running stats would otherwise
    drift under augmented/reweighted batches."""

    def step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        def loss_fn(params):
            if freeze_bn:
                logits = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    train=False,
                )
                new_stats = state.batch_stats
            else:
                logits, updates = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                )
                new_stats = updates["batch_stats"]
            loss = losses.cross_entropy(logits, labels, label_smoothing)
            return loss, (new_stats, logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return new_state, {"loss": loss, "accuracy": acc}

    if mesh is None:
        return jax.jit(step)

    def sharded_step(state, images, labels):
        images = jax.lax.with_sharding_constraint(images, mesh_lib.data_sharding(mesh, images.ndim))
        labels = jax.lax.with_sharding_constraint(labels, mesh_lib.data_sharding(mesh, labels.ndim))
        return step(state, images, labels)

    return jax.jit(sharded_step)


def make_cls_eval_step() -> Callable:
    def step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        loss = losses.cross_entropy(logits, labels)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return {"loss": loss, "accuracy": acc, "logits": logits}

    return jax.jit(step)
