"""Piece classifier trainer.

Optax/TPU re-implementation of the reference's scripts/train/
train_classifier.py: Adam + CrossEntropy + StepLR(step 4, gamma 0.1),
early stopping, best-val-accuracy checkpointing (with optimizer state
metadata), per-sample classification metrics + embeddings (the models'
feature tap replaces the module-index-90 hook), augmentations
(RandomAffine/RandomRotation) as batched device ops.

Note on normalization: the reference trains with Normalize(0.564, 0.246)
(train_classifier.py:41) but serves with a bare /255 (core.py:237) — a
train/serve skew.  This framework uses /255 consistently in both paths.

Run: python -m chessvision_tpu.train.train_classifier --epochs 10 ...
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import Any

import numpy as np

from chessvision_tpu import constants
from chessvision_tpu.utils import enable_compilation_cache, setup_logger

logger = logging.getLogger(__name__)

PIECE_CLASSIFICATION_PROJECT = "chessvision-classification"  # reference config.py:9

LR_SCHEDULER_STEP_SIZE = 4  # reference train_classifier.py:30
LR_SCHEDULER_GAMMA = 0.1


def train_model(
    *,
    model_id: str = "resnet18",
    epochs: int = 10,
    batch_size: int = 256,
    learning_rate: float = 1e-3,
    run_name: str | None = None,
    run_description: str | None = None,
    use_sample_weights: bool = False,
    collection_frequency: int = 5,
    patience: int = 5,
    seed: int = 42,
    augment: bool = True,
    model_dtype: Any = None,
    use_mesh: bool = True,
    width: int | None = None,
    lr_step_size: int = LR_SCHEDULER_STEP_SIZE,
    lr_gamma: float = LR_SCHEDULER_GAMMA,
    resume: str | None = None,
    label_smoothing: float = 0.0,
    freeze_bn: bool = False,
    ema_decay: float = 0.0,
    schedule_kind: str = "step",
    cutout: bool = False,
    aug_dim: bool = False,
    aug_fade: bool = False,
    extra_data: list[str] | None = None,
    extra_weight: float = 1.0,
) -> tuple[Any, str]:
    import jax
    import jax.numpy as jnp
    import optax

    from chessvision_tpu import models, runstore
    from chessvision_tpu.checkpoint import save_checkpoint
    from chessvision_tpu.parallel import (
        create_mesh,
        make_global_batch,
        replicate,
        spans_processes,
    )
    from chessvision_tpu.runstore import metrics as collectors
    from chessvision_tpu.train import data as data_lib
    from chessvision_tpu.train.augment import augment_classification_batch
    from chessvision_tpu.train.steps import TrainState, make_cls_train_step

    enable_compilation_cache()
    if model_dtype is None:
        model_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    # multi-host: same loop on every process over the same seeded data
    # order; only process 0 owns the run dir, logs, and checkpoints
    is_main = jax.process_index() == 0
    run = runstore.NullRun() if not is_main else runstore.init(
        PIECE_CLASSIFICATION_PROJECT,
        run_name,
        parameters={
            "model_id": model_id,
            "epochs": epochs,
            "batch_size": batch_size,
            "learning_rate": learning_rate,
            "use_sample_weights": use_sample_weights,
            "augment": augment,
            "seed": seed,
            "extra_data": list(extra_data or []),
            "extra_weight": extra_weight,
        },
        description=run_description,
    )
    checkpoint_path = str(run.bulk_data_url / "checkpoint.npz")

    data = data_lib.load_squares()
    # mined/curated extra batches join the TRAIN side only — val stays the
    # real split so scores remain comparable across runs (same contract as
    # train_unet --extra-data)
    n_extra = 0
    for extra_dir in extra_data or []:
        imgs_e, labels_e, ids_e = data_lib.load_squares_dir(extra_dir, data.class_names)
        data.train_images = np.concatenate([data.train_images, imgs_e])
        data.train_labels = np.concatenate([data.train_labels, labels_e])
        data.train_ids = data.train_ids + ids_e
        n_extra += len(ids_e)
        logger.info("Appended %d extra training squares from %s", len(ids_e), extra_dir)
    n_train, n_val = len(data.train_labels), len(data.val_labels)
    logger.info("Training on %d / validating on %d squares", n_train, n_val)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = create_mesh()
        batch_size -= batch_size % mesh.size

    if resume:
        # adopt the checkpoint's architecture — resumed params fit exactly
        # one (model_id, width); mismatched CLI/default values would only
        # crash at init with a shape error (see train_unet.train_model)
        from chessvision_tpu.checkpoint import load_metadata

        tc = (load_metadata(resume) or {}).get("training_config", {})
        for field, current in (("model_id", model_id), ("width", width)):
            if field in tc and tc[field] != current:
                logger.warning(
                    "resume: adopting %s=%r from checkpoint (requested %r)",
                    field, tc[field], current,
                )
        model_id = tc.get("model_id", model_id)
        width = tc.get("width", width)

    kwargs = {"width": width} if width else {}
    model, spec = models.create_classifier(model_id, dtype=model_dtype, **kwargs)
    rng_np = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.zeros((1, 64, 64, 1), jnp.float32))

    steps_per_epoch = max(1, n_train // batch_size)
    if schedule_kind == "cosine":
        # cosine-to-zero over the full run with a 2-epoch linear warmup
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate / 25,
            peak_value=learning_rate,
            warmup_steps=2 * steps_per_epoch,
            decay_steps=epochs * steps_per_epoch,
        )
    else:
        # StepLR(step_size=4, gamma=0.1) — the reference's schedule
        schedule = optax.exponential_decay(
            learning_rate,
            transition_steps=lr_step_size * steps_per_epoch,
            decay_rate=lr_gamma,
            staircase=True,
        )
    tx = optax.adam(schedule)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )

    start_epoch = 1
    resumed_ema = None
    if resume:
        # real resume (the reference's --resume flag is unwired,
        # train_classifier.py:349): params + BN stats + optimizer state +
        # epoch come back from the checkpoint
        from chessvision_tpu.checkpoint import load_checkpoint as _load
        from chessvision_tpu.checkpoint import load_opt_state_leaves

        loaded, res_meta = _load(resume)
        resumed_ema = loaded.get("ema_params")
        state = state.replace(
            params=jax.tree.map(jnp.asarray, loaded["params"]),
            batch_stats=jax.tree.map(jnp.asarray, loaded["batch_stats"]),
        )
        leaves = load_opt_state_leaves(loaded)
        if leaves is not None:
            treedef = jax.tree.structure(state.opt_state)
            state = state.replace(
                opt_state=jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
            )
        start_epoch = int(res_meta.get("epoch", 0)) + 1
        logger.info("Resumed from %s at epoch %d", resume, start_epoch)
        if start_epoch > epochs:
            raise ValueError(
                f"--resume checkpoint is at epoch {start_epoch - 1} but --epochs is "
                f"{epochs}: no epochs would run (epochs counts TOTAL epochs across "
                f"resumes). Pass --epochs > {start_epoch - 1} to fine-tune."
            )

    if mesh is not None:
        state = jax.device_put(state, replicate(mesh))

    train_step = make_cls_train_step(mesh, label_smoothing=label_smoothing, freeze_bn=freeze_bn)

    @jax.jit
    def collect_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray):
        logits, features = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            return_features=True,
        )
        m = collectors.classification_metrics(logits, labels)
        m.update(collectors.top2_margin_and_entropy(jax.nn.softmax(logits, axis=-1)))
        m["embedding"] = features
        return m

    @jax.jit
    def val_step(state: TrainState, images: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray):
        """One forward pass → (loss, correct-count over real rows).  Both
        outputs are replicated scalars, so only scalars cross to host —
        multi-process-safe (pulling the sharded logits would not be)."""
        from chessvision_tpu.train import losses as losses_lib

        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        loss = losses_lib.cross_entropy(logits, labels)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
        return loss, correct

    def run_validation(state: TrainState) -> tuple[float, float]:
        losses, correct, total = 0.0, 0, 0
        for idx in data_lib.batches(n_val, 512):
            idx, real = data_lib.pad_indices(idx, 512)
            imgs = make_global_batch(
                mesh, data.val_images[idx].astype(np.float32)[..., None] / 255.0
            )
            labs = make_global_batch(mesh, np.asarray(data.val_labels[idx]))
            mask = make_global_batch(
                mesh, (np.arange(len(idx)) < real).astype(np.float32)
            )
            loss, n_ok = val_step(state, imgs, labs, mask)
            losses += float(loss) * real  # padded dupes shift loss negligibly
            correct += int(n_ok)
            total += real
        return losses / total, correct / total

    collection_epochs = list(range(collection_frequency, epochs + 1, collection_frequency))
    if epochs not in collection_epochs:
        collection_epochs.append(epochs)

    training_config = {
        "model_id": model_id,
        "epochs": epochs,
        "batch_size": batch_size,
        "learning_rate": learning_rate,
        "run_name": run.name,
    }
    if width:
        training_config["width"] = width
    weights = None
    if use_sample_weights:
        from chessvision_tpu.train.tables import (
            get_or_create_classification_tables,
            sample_weights_for_ids,
        )

        try:
            tables = get_or_create_classification_tables()
            weights = sample_weights_for_ids(tables["train"], data.train_ids)
        except Exception:  # noqa: BLE001 — table store optional for training
            weights = None
        if weights is None:
            # inverse class frequency fallback
            counts = np.bincount(data.train_labels, minlength=constants.NUM_CLASSES)
            weights = (1.0 / np.maximum(counts, 1))[data.train_labels]
    if n_extra and extra_weight != 1.0:
        # relative sampling weight of the appended batches vs the originals
        if weights is None:
            weights = np.ones(n_train, np.float64)
        weights = np.asarray(weights, np.float64)
        weights[-n_extra:] *= extra_weight

    # Exponential moving average of params — validated/checkpointed
    # alongside the raw params when enabled (classic trick the reference
    # lacks; the EMA point is usually a better generalizer late in
    # training and is what beats the raw trajectory's best val).  On
    # resume, pick the saved EMA back up where it left off.
    ema_params = None
    if ema_decay > 0:
        src = resumed_ema if resumed_ema is not None else state.params
        ema_params = jax.tree.map(jnp.asarray, src)

    @jax.jit
    def ema_update(ema, params):
        return jax.tree.map(lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params)

    def eval_view(state: Any) -> Any:
        return state.replace(params=ema_params) if ema_params is not None else state

    best_val_acc = float("-inf")
    patience_counter = 0
    start_time = time.time()
    final_epoch = 0

    for epoch in range(start_epoch, epochs + 1):
        final_epoch = epoch
        epoch_loss, correct_sum, seen = 0.0, 0.0, 0
        for idx in data_lib.batches(n_train, batch_size, rng=rng_np, weights=weights, drop_last=True):
            imgs = make_global_batch(
                mesh, data.train_images[idx].astype(np.float32)[..., None] / 255.0
            )
            if augment:
                key, sub = jax.random.split(key)
                imgs = augment_classification_batch(
                    sub, imgs, cutout=cutout, dim=aug_dim, fade=aug_fade
                )
            labs = make_global_batch(mesh, np.asarray(data.train_labels[idx]))
            state, metrics = train_step(state, imgs, labs)
            if ema_params is not None:
                ema_params = ema_update(ema_params, state.params)
            epoch_loss += float(metrics["loss"]) * len(idx)
            correct_sum += float(metrics["accuracy"]) * len(idx)
            seen += len(idx)

        val_loss, val_acc = run_validation(eval_view(state))
        run.log(
            {
                "epoch": epoch,
                "train_loss": epoch_loss / max(seen, 1),
                "train_accuracy": correct_sum / max(seen, 1),
                "val_loss": val_loss,
                "val_accuracy": val_acc,
            }
        )
        logger.info(
            "epoch %d train_acc %.4f val_acc %.4f val_loss %.4f",
            epoch,
            correct_sum / max(seen, 1),
            val_acc,
            val_loss,
        )

        if val_acc > best_val_acc:
            best_val_acc = val_acc
            patience_counter = 0
            # raw params stay paired with opt_state (a consistent resume
            # point); the EMA view — the one validated and promoted for
            # inference — is stored separately under "ema_params"
            if is_main:
                variables = {
                    "params": jax.tree.map(np.asarray, state.params),
                    "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
                }
                if ema_params is not None:
                    variables["ema_params"] = jax.tree.map(np.asarray, ema_params)
                save_checkpoint(
                    checkpoint_path,
                    variables,
                    {"best_val_score": best_val_acc, "epoch": epoch, "training_config": training_config},
                    opt_state=jax.tree.map(np.asarray, state.opt_state),
                )
                logger.info("Checkpoint %d saved (val acc %.4f)", epoch, best_val_acc)
        else:
            patience_counter += 1

        if epoch in collection_epochs and mesh is not None and spans_processes(mesh):
            logger.info("Skipping metrics collection (multi-process mesh)")
        elif epoch in collection_epochs:
            for split, imgs_a, labs_a, ids in (
                ("train", data.train_images, data.train_labels, data.train_ids),
                ("val", data.val_images, data.val_labels, data.val_ids),
            ):
                rows: dict[str, list] = {}
                for idx in data_lib.batches(len(labs_a), 512):
                    idx, real = data_lib.pad_indices(idx, 512)
                    m = collect_step(
                        state,
                        jnp.asarray(imgs_a[idx], jnp.float32)[..., None] / 255.0,
                        jnp.asarray(labs_a[idx]),
                    )
                    for k, v in collectors.to_numpy(m).items():
                        rows.setdefault(k, []).append(v[:real])
                cols = {k: np.concatenate(v) for k, v in rows.items()}
                cols["example_id"] = np.asarray(ids, object)
                name = f"{split}_epoch{epoch}"
                run.write_metrics_table(name, cols)
                run.reduce_embeddings(name, "embedding")

        if patience_counter >= patience and epoch != epochs:
            logger.info("Early stopping after %d epochs", epoch)
            break

    training_time = time.time() - start_time
    run.set_parameters(
        {
            "best_val_score": best_val_acc,
            "model_path": checkpoint_path,
            "final_epoch": final_epoch,
            "training_time": training_time,
        }
    )
    run.set_status_completed()
    logger.info("Training done in %.0fs, best val acc %.4f", training_time, best_val_acc)
    return run, checkpoint_path


def get_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train the piece classifier")
    parser.add_argument("--model-id", type=str, default="resnet18", help="resnet18 or yolo")
    parser.add_argument("--run-name", type=str, default=None)
    parser.add_argument("--run-description", type=str, default=None)
    parser.add_argument("--skip-eval", action="store_true")
    parser.add_argument("--use-sample-weights", action="store_true")
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--collection-frequency", type=int, default=5)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--no-augment", action="store_true", default=False)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--lr-step-size", type=int, default=LR_SCHEDULER_STEP_SIZE)
    parser.add_argument("--lr-gamma", type=float, default=LR_SCHEDULER_GAMMA)
    parser.add_argument("--resume", type=str, default=None, help="checkpoint to resume from")
    parser.add_argument("--label-smoothing", type=float, default=0.0)
    parser.add_argument("--freeze-bn", action="store_true", help="fine-tune with frozen BatchNorm running stats")
    parser.add_argument("--ema-decay", type=float, default=0.0, help="validate/checkpoint an EMA of params (0 = off, try 0.999)")
    parser.add_argument("--schedule", choices=("step", "cosine"), default="step", help="LR schedule: reference StepLR or warmup-cosine")
    parser.add_argument("--cutout", action="store_true", help="random-erasing augmentation (occlusion robustness)")
    parser.add_argument(
        "--aug-dim", action="store_true",
        help="heavy per-square dimming aug, U(0.3,0.75) at p=0.25 — gutter/"
        "shadow squares sit below the standard 0.75x jitter floor "
        "(RESULTS.md round 5)",
    )
    parser.add_argument(
        "--aug-fade", action="store_true",
        help="contrast-fade-toward-paper-white aug at p=0.25 — the measured "
        "transform of book-gutter defocus (faint pieces on a light ground; "
        "crop std 25-39 -> 10-20 with normal mean, RESULTS.md round 5)",
    )
    parser.add_argument(
        "--extra-data", action="append", default=None,
        help="extra ImageFolder of 64-px squares appended to the TRAIN split "
        "(repeatable); e.g. scripts/mine_warped_squares.py output",
    )
    parser.add_argument(
        "--extra-weight", type=float, default=1.0,
        help="relative sampling weight of --extra-data examples",
    )
    parser.add_argument("--promote", action="store_true")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: jax.distributed coordinator host:port")
    parser.add_argument("--num-processes", type=int, default=None, help="multi-host: process count")
    parser.add_argument("--process-id", type=int, default=None, help="multi-host: this process's index")
    return parser.parse_args()


def main() -> None:
    args = get_args()
    setup_logger("chessvision_tpu")
    from chessvision_tpu.parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    run, checkpoint_path = train_model(
        model_id=args.model_id,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        run_name=args.run_name,
        run_description=args.run_description,
        use_sample_weights=args.use_sample_weights,
        collection_frequency=args.collection_frequency,
        patience=args.patience,
        seed=args.seed,
        augment=not args.no_augment,
        width=args.width,
        lr_step_size=args.lr_step_size,
        lr_gamma=args.lr_gamma,
        resume=args.resume,
        label_smoothing=args.label_smoothing,
        freeze_bn=args.freeze_bn,
        ema_decay=args.ema_decay,
        schedule_kind=args.schedule,
        cutout=args.cutout,
        aug_dim=args.aug_dim,
        aug_fade=args.aug_fade,
        extra_data=args.extra_data,
        extra_weight=args.extra_weight,
    )
    import jax

    if jax.process_index() != 0:
        return  # promotion/eval are process-0 work in multi-host runs
    from pathlib import Path

    from chessvision_tpu.checkpoint import promote_checkpoint

    default = (
        constants.BEST_YOLO_CLASSIFIER if args.model_id == "yolo" else constants.BEST_CLASSIFIER_WEIGHTS
    )
    if args.promote or not Path(default).exists():
        promote_checkpoint(checkpoint_path, default)
        logger.info("Promoted checkpoint to %s", default)

    if not args.skip_eval:
        from chessvision_tpu.eval.evaluate import evaluate_model

        evaluate_model(run=run, classifier_weights=checkpoint_path, classifier_model_id=args.model_id)


if __name__ == "__main__":
    main()
