"""Segmentation (board extraction) trainer.

The optax/TPU re-implementation of the reference's scripts/train/
train_unet.py: RMSprop(momentum 0.999, wd 1e-8) + BCE+dice, gradient clip
1.0, two mid-epoch validations with ReduceLROnPlateau(max, patience 3) on
val dice, best-dice checkpointing with metadata, early stopping, optional
augmentation and sample-weight sampling, per-sample metrics + embeddings
collection on collection epochs, and a post-train auto-eval — all against
the local runstore instead of 3LC.  Differences are TPU-idiomatic: batched
device augmentation, bf16 compute without a GradScaler, DP sharding via
mesh when more than one device is present.

Run: python -m chessvision_tpu.train.train_unet --epochs 20 ...
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

BOARD_EXTRACTION_PROJECT = "chessvision-segmentation"  # reference config.py:8


def guard_verdict(
    guard: dict[str, float], baseline: dict[str, float], tolerance: float
) -> bool:
    """True when a candidate's geometry did NOT regress vs the baseline:
    mean quadrangle corner error within ``tolerance`` px of the starting
    model's and no additional val boards lost.  (The anti-overfit stop
    signal for synthetic fine-tunes — val dice alone passed a model that
    went 46 → 71 test wrong squares, RESULTS.md round 4/5.)"""
    return (
        guard["err"] <= baseline["err"] + tolerance
        and guard["lost"] <= baseline["lost"]
    )


def train_model(
    *,
    epochs: int = 20,
    batch_size: int = 32,
    learning_rate: float = 3e-5,
    weight_decay: float = 1e-8,
    momentum: float = 0.999,
    gradient_clipping: float = 1.0,
    validations_per_epoch: int = 2,
    run_name: str | None = None,
    run_description: str | None = None,
    use_sample_weights: bool = False,
    collection_frequency: int = 5,
    patience: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
    augment: bool = True,
    aug_illum_gradient: bool = False,
    bilinear: bool = False,
    base: int = 64,
    model_dtype: Any = None,
    use_mesh: bool = True,
    model_id: str = "unet",
    optimizer: str = "rmsprop",
    resume: str | None = None,
    ema_decay: float = 0.0,
    extra_data: list[str] | None = None,
    extra_weight: float = 1.0,
    guard_quad: bool = False,
    guard_tolerance: float = 0.75,
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
    from chessvision_tpu.train.augment import augment_segmentation_batch
    from chessvision_tpu.train.steps import TrainState, make_seg_eval_step, make_seg_train_step

    enable_compilation_cache()
    if model_dtype is None:
        model_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    # multi-host: every process runs the same loop on the same seeded
    # data order; only process 0 owns the run dir, logs, and checkpoints
    is_main = jax.process_index() == 0
    run = runstore.NullRun() if not is_main else runstore.init(
        BOARD_EXTRACTION_PROJECT,
        run_name,
        parameters={
            "epochs": epochs,
            "batch_size": batch_size,
            "learning_rate": learning_rate,
            "use_sample_weights": use_sample_weights,
            "augment": augment,
            "threshold": threshold,
            "seed": seed,
            "bilinear": bilinear,
            "extra_data": list(extra_data or []),
            "extra_weight": extra_weight,
        },
        description=run_description,
    )
    checkpoint_path = str(run.bulk_data_url / "checkpoint.npz")

    data = data_lib.load_board_extraction()
    # curated/synthetic extra batches join the TRAIN side only — val stays
    # the real 10% split so scores remain comparable across runs (the 3LC
    # merge-new-batch-into-training move, reference merge_new_train.py)
    n_extra = 0
    for extra_dir in extra_data or []:
        imgs_e, masks_e, ids_e = data_lib.load_image_mask_dir(extra_dir)
        data.train_images = np.concatenate([data.train_images, imgs_e])
        data.train_masks = np.concatenate([data.train_masks, masks_e])
        data.train_ids = data.train_ids + ids_e
        n_extra += len(ids_e)
        logger.info("Appended %d extra training examples from %s", len(ids_e), extra_dir)
    n_train, n_val = len(data.train_images), len(data.val_images)
    logger.info("Training on %d / validating on %d images", n_train, n_val)

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = create_mesh()
        batch_size = max(batch_size, mesh.size)
        batch_size -= batch_size % mesh.size

    if resume:
        # Adopt the checkpoint's architecture: resumed params fit exactly
        # one (model_id, base, bilinear) triple, so CLI/default values that
        # disagree would only crash at init with a shape error (measured:
        # fine-tuning the promoted base-32 extractor under the base-64
        # default).  The caller's training hyperparams (lr, optimizer,
        # epochs) still apply — only the architecture comes from the file.
        from chessvision_tpu.checkpoint import load_metadata

        tc = (load_metadata(resume) or {}).get("training_config", {})
        for field, current in (("model_id", model_id), ("base", base), ("bilinear", bilinear)):
            if field in tc and tc[field] != current:
                logger.warning(
                    "resume: adopting %s=%r from checkpoint (requested %r)",
                    field, tc[field], current,
                )
        model_id = tc.get("model_id", model_id)
        base = tc.get("base", base)
        bilinear = tc.get("bilinear", bilinear)

    if model_id == "unet":
        model = models.UNet(bilinear=bilinear, base=base, dtype=model_dtype)
    else:
        # the YOLO-segmentation slot (reference
        # train_yolo_segmentation_model.py trains yolo11s-seg on the same
        # tables at imgsz=256; here the shape-compatible YoloSeg)
        model, _ = models.create_extractor(model_id, dtype=model_dtype)
    rng_np = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    variables = model.init(key, jnp.zeros((1, 256, 256, 3), jnp.float32))

    # ReduceLROnPlateau via injected hyperparams (torch: factor 0.1,
    # patience 3, mode max — train_unet.py:243)
    def make_tx(lr: float) -> optax.GradientTransformation:
        if optimizer == "adam":
            core = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
        else:
            core = optax.inject_hyperparams(optax.rmsprop)(
                learning_rate=lr, momentum=momentum, eps=1e-8
            )
        return optax.chain(
            optax.clip_by_global_norm(gradient_clipping),
            optax.add_decayed_weights(weight_decay),
            core,
        )

    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_tx(learning_rate),
    )

    start_epoch = 1
    resumed_ema = None
    if resume:
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

    train_step = make_seg_train_step(mesh)
    eval_step = make_seg_eval_step()

    has_feature_tap = model_id == "unet"

    @jax.jit
    def collect_step(state: TrainState, images: jnp.ndarray, masks: jnp.ndarray):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if has_feature_tap:
            out, features = state.apply_fn(variables, images, return_features=True)
        else:
            out = state.apply_fn(variables, images)
            features = jnp.mean(out, axis=(1, 2))  # pooled logits fallback
        logits = out[..., 0]
        m: dict[str, jnp.ndarray] = {}
        m.update(collectors.segmentation_loss_per_sample(logits, masks))
        m.update(collectors.segmentation_quality(logits, masks, threshold))
        m["embedding"] = features
        return m

    def set_lr(state: TrainState, lr: float) -> TrainState:
        opt_state = list(state.opt_state)
        inner = opt_state[-1]
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(opt_state=tuple(opt_state))

    def run_validation(state: TrainState) -> float:
        scores = []
        total = 0
        for idx in data_lib.batches(n_val, batch_size, drop_last=False):
            idx, real = data_lib.pad_indices(idx, batch_size)
            imgs = make_global_batch(mesh, data.val_images[idx].astype(np.float32) / 255.0)
            msks = make_global_batch(mesh, np.asarray(data.val_masks[idx], np.float32))
            # padded rows repeat the last sample; dice is per-batch mean, so
            # weight by the real count for the aggregate
            scores.append(float(eval_step(state, imgs, msks)) * real)
            total += real
        return float(np.sum(scores) / total)

    # ---- geometry guard (anti-overfit protocol for synthetic fine-tunes) ----
    # Val dice is blind to the failure mode that matters downstream: a mask
    # that bleeds a few pixels past the board edge shifts the extracted
    # quadrangle by part of a square and mis-centers every classifier crop
    # (measured round 4: a synthetic fine-tune hit a val-dice RECORD of
    # 0.9878 while test wrong squares went 46 → 71 — dice up, geometry
    # ruined).  The guard tracks the edge-sensitive quantity directly:
    # quadrangle corner error of the candidate model's masks vs the
    # ground-truth masks' quads on the REAL val boards, and refuses to
    # checkpoint a dice "improvement" whose corner error regressed beyond
    # ``guard_tolerance`` px of the resumed baseline (or loses a board the
    # GT quad finds).  (The inspect→fix-data→retrain loop's missing stop
    # signal; reference analogue: none — 3LC inspection is manual,
    # reference train_unet.py:186-196.)
    gt_quads = gt_found = None
    run_guard = None
    guard_baseline = {"err": float("inf"), "lost": n_val}
    if guard_quad:
        from chessvision_tpu.ops.quad import find_quadrangle_batch

        guard_bs = min(32, max(8, batch_size))

        @jax.jit
        def _quad_step(state: TrainState, images: jnp.ndarray):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            logits = state.apply_fn(variables, images)[..., 0].astype(jnp.float32)
            return find_quadrangle_batch(jax.nn.sigmoid(logits), jnp.float32(threshold))

        def _mask_quads() -> tuple[np.ndarray, np.ndarray]:
            from chessvision_tpu.parallel.mesh import host_gather

            quads, founds = [], []
            for idx in data_lib.batches(n_val, guard_bs, drop_last=False):
                idx, real = data_lib.pad_indices(idx, guard_bs)
                masks = jnp.asarray(data.val_masks[idx], jnp.float32)
                q, f = find_quadrangle_batch(masks, jnp.float32(0.5))
                q, f = host_gather(None, (q, f))
                quads.append(q[:real])
                founds.append(f[:real])
            return np.concatenate(quads), np.concatenate(founds)

        gt_quads, gt_found = _mask_quads()
        logger.info("Quad guard: %d/%d val boards have a GT quadrangle", int(gt_found.sum()), n_val)

        def run_guard(state: TrainState) -> dict[str, float]:
            """Mean corner L2 (px at 256²) vs GT quads + boards lost."""
            from chessvision_tpu.parallel.mesh import host_gather

            errs: list[float] = []
            lost = 0
            for idx in data_lib.batches(n_val, guard_bs, drop_last=False):
                idx, real = data_lib.pad_indices(idx, guard_bs)
                imgs = make_global_batch(mesh, data.val_images[idx].astype(np.float32) / 255.0)
                q, f = host_gather(mesh, _quad_step(state, imgs))
                q, f = q[:real], f[:real]
                sel = gt_found[idx[:real]]
                lost += int(np.sum(sel & ~f))
                ok = sel & f
                if ok.any():
                    d = np.linalg.norm(q[ok] - gt_quads[idx[:real]][ok], axis=-1)
                    errs.extend(np.mean(d, axis=-1).tolist())
            return {"err": float(np.mean(errs)) if errs else float("inf"), "lost": lost}

        guard_baseline = run_guard(state)
        logger.info(
            "Quad guard baseline: corner err %.3f px, %d boards lost",
            guard_baseline["err"], guard_baseline["lost"],
        )

    collection_epochs = list(range(collection_frequency, epochs + 1, collection_frequency))
    if epochs not in collection_epochs:
        collection_epochs.append(epochs)

    training_config = {
        "epochs": epochs,
        "batch_size": batch_size,
        "learning_rate": learning_rate,
        "threshold": threshold,
        "run_name": run.name,
        "model_id": model_id,
        "bilinear": bilinear,
        "base": base,
        "optimizer": optimizer,
    }
    if is_main:
        save_checkpoint(
            checkpoint_path,
            {"params": jax.tree.map(np.asarray, state.params), "batch_stats": jax.tree.map(np.asarray, state.batch_stats)},
            {"best_val_score": float("-inf"), "training_config": training_config, "epoch": 0},
        )

    weights = None
    if use_sample_weights:
        # prefer curated per-example weights from the registered dataset
        # table (reference: table.create_sampler(), train_unet.py:189);
        # fall back to a mask-area heuristic when uniform/absent
        from chessvision_tpu.train.tables import (
            get_or_create_board_extraction_tables,
            sample_weights_for_ids,
        )

        try:
            tables = get_or_create_board_extraction_tables()
            weights = sample_weights_for_ids(tables["train"], data.train_ids)
        except Exception:  # noqa: BLE001 — table store optional for training
            weights = None
        if weights is None:
            weights = data.train_masks.mean(axis=(1, 2)) + 0.05
    if n_extra and extra_weight != 1.0:
        # relative sampling weight of the appended batches vs the originals
        if weights is None:
            weights = np.ones(n_train, np.float64)
        weights = np.asarray(weights, np.float64)
        weights[-n_extra:] *= extra_weight

    # EMA of params — validated/checkpointed alongside the raw params
    # when enabled (same semantics as the classifier trainer's
    # --ema-decay); picked back up from "ema_params" on resume
    ema_params = None
    if ema_decay > 0:
        src = resumed_ema if resumed_ema is not None else state.params
        ema_params = jax.tree.map(jnp.asarray, src)

    @jax.jit
    def ema_update(ema, params):
        return jax.tree.map(lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params)

    def eval_view(st):
        return st.replace(params=ema_params) if ema_params is not None else st

    steps_per_epoch = max(1, n_train // batch_size)
    validation_interval = max(1, steps_per_epoch // validations_per_epoch)
    best_val_score = float("-inf")
    patience_counter = 0
    plateau_counter = 0
    plateau_best = float("-inf")
    current_lr = learning_rate
    global_step = 0
    val_score = float("-inf")
    start_time = time.time()
    final_epoch = 0

    for epoch in range(start_epoch, epochs + 1):
        final_epoch = epoch
        epoch_loss = 0.0
        for i, idx in enumerate(
            data_lib.batches(n_train, batch_size, rng=rng_np, weights=weights, drop_last=True)
        ):
            imgs = make_global_batch(mesh, data.train_images[idx].astype(np.float32) / 255.0)
            msks = make_global_batch(mesh, np.asarray(data.train_masks[idx], np.float32))
            if augment:
                key, sub = jax.random.split(key)
                imgs, msks = augment_segmentation_batch(
                    sub, imgs, msks, illum_gradient=aug_illum_gradient
                )
            state, metrics = train_step(state, imgs, msks)
            if ema_params is not None:
                ema_params = ema_update(ema_params, state.params)
            global_step += 1
            epoch_loss += float(metrics["loss"])

            if i > 0 and i % validation_interval == 0:
                val_score = run_validation(eval_view(state))
                # plateau LR schedule (mode max, patience 3, factor 0.1)
                if val_score > plateau_best + 1e-6:
                    plateau_best = val_score
                    plateau_counter = 0
                else:
                    plateau_counter += 1
                    if plateau_counter > 3:
                        current_lr *= 0.1
                        state = set_lr(state, current_lr)
                        plateau_counter = 0
                        logger.info("Plateau: lr -> %g", current_lr)
                run.log({"val_dice": val_score, "step": global_step, "lr": current_lr})
                logger.info("epoch %d step %d val_dice %.4f", epoch, global_step, val_score)

        guard_ok = True
        if run_guard is not None and val_score > best_val_score:
            g = run_guard(eval_view(state))
            guard_ok = guard_verdict(g, guard_baseline, guard_tolerance)
            run.log({"guard_corner_err": g["err"], "guard_lost": g["lost"], "epoch": epoch})
            if not guard_ok:
                logger.warning(
                    "Guard VETO at epoch %d: dice %.4f would be a record but corner "
                    "err %.3f px (baseline %.3f + tol %.2f) / lost %d (baseline %d) "
                    "regressed — checkpoint NOT saved",
                    epoch, val_score, g["err"], guard_baseline["err"],
                    guard_tolerance, g["lost"], guard_baseline["lost"],
                )
        if val_score > best_val_score and guard_ok:
            best_val_score = val_score
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
                    {"best_val_score": best_val_score, "epoch": epoch, "training_config": training_config},
                    opt_state=jax.tree.map(np.asarray, state.opt_state),
                )
                logger.info("Checkpoint %d saved (dice %.4f)", epoch, best_val_score)
        else:
            patience_counter += 1

        run.log({"train_loss": epoch_loss / steps_per_epoch, "epoch": epoch})

        if epoch in collection_epochs and mesh is not None and spans_processes(mesh):
            # per-sample collection pulls SHARDED arrays to host, which a
            # multi-process run cannot do without an allgather; curation
            # passes run single-host (the tables/metrics platform is a
            # host-side workflow)
            logger.info("Skipping metrics collection (multi-process mesh)")
        elif epoch in collection_epochs:
            for split, imgs_a, msks_a, ids in (
                ("train", data.train_images, data.train_masks, data.train_ids),
                ("val", data.val_images, data.val_masks, data.val_ids),
            ):
                rows: dict[str, list] = {}
                for idx in data_lib.batches(len(imgs_a), 8):
                    idx, real = data_lib.pad_indices(idx, 8)
                    m = collect_step(
                        state,
                        jnp.asarray(imgs_a[idx], jnp.float32) / 255.0,
                        jnp.asarray(msks_a[idx]),
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
            "best_val_score": best_val_score,
            "model_path": checkpoint_path,
            "final_epoch": final_epoch,
            "training_time": training_time,
        }
    )
    run.set_status_completed()
    logger.info("Training done in %.0fs, best dice %.4f", training_time, best_val_score)
    return run, checkpoint_path


def get_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train the UNet board extractor")
    parser.add_argument("--run-name", type=str, default=None)
    parser.add_argument("--run-description", type=str, default=None)
    parser.add_argument("--skip-eval", action="store_true")
    parser.add_argument("--use-sample-weights", action="store_true")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--learning-rate", type=float, default=3e-5)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--collection-frequency", type=int, default=5)
    parser.add_argument("--patience", type=int, default=5)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--bilinear", action="store_true", default=False)
    parser.add_argument("--ema-decay", type=float, default=0.0, help="validate/checkpoint an EMA of params (0 = off)")
    parser.add_argument("--base", type=int, default=64)
    parser.add_argument("--no-augment", action="store_true", default=False)
    parser.add_argument(
        "--aug-illum-gradient", action="store_true",
        help="page-gutter illumination-gradient augmentation on real photos "
        "(train.augment._illum_gradient_batch; RESULTS.md round 5)",
    )
    parser.add_argument("--model-id", type=str, default="unet", help="unet or yolo")
    parser.add_argument("--optimizer", type=str, default="rmsprop", choices=["rmsprop", "adam"])
    parser.add_argument("--resume", type=str, default=None, help="checkpoint to resume from")
    parser.add_argument(
        "--extra-data", action="append", default=None,
        help="images/+masks/ dir appended to the TRAIN split (repeatable); "
        "e.g. a synthetic batch from scripts/make_screen_boards.py",
    )
    parser.add_argument(
        "--extra-weight", type=float, default=1.0,
        help="relative sampling weight of --extra-data examples",
    )
    parser.add_argument(
        "--guard-quad", action="store_true",
        help="geometry guard: refuse checkpoints whose val quadrangle corner "
        "error regresses vs the starting model (anti-overfit protocol for "
        "synthetic fine-tunes; see RESULTS.md round 5)",
    )
    parser.add_argument(
        "--guard-tolerance", type=float, default=0.75,
        help="allowed mean corner-error regression in px (256² mask space)",
    )
    parser.add_argument("--promote", action="store_true", help="copy best checkpoint to weights/")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: jax.distributed coordinator host:port")
    parser.add_argument("--num-processes", type=int, default=None, help="multi-host: process count")
    parser.add_argument("--process-id", type=int, default=None, help="multi-host: this process's index")
    return parser.parse_args()


def main() -> None:
    args = get_args()
    setup_logger("chessvision_tpu")
    # join the multi-host cluster BEFORE any backend query (explicit args
    # or env autodetection; plain single-process runs are a no-op)
    from chessvision_tpu.parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    run, checkpoint_path = train_model(
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        run_name=args.run_name,
        run_description=args.run_description,
        use_sample_weights=args.use_sample_weights,
        collection_frequency=args.collection_frequency,
        patience=args.patience,
        threshold=args.threshold,
        seed=args.seed,
        augment=not args.no_augment,
        aug_illum_gradient=args.aug_illum_gradient,
        bilinear=args.bilinear,
        base=args.base,
        model_id=args.model_id,
        optimizer=args.optimizer,
        resume=args.resume,
        ema_decay=args.ema_decay,
        extra_data=args.extra_data,
        extra_weight=args.extra_weight,
        guard_quad=args.guard_quad,
        guard_tolerance=args.guard_tolerance,
    )
    import jax

    if jax.process_index() != 0:
        return  # promotion/eval are process-0 work in multi-host runs
    from pathlib import Path

    from chessvision_tpu.checkpoint import promote_checkpoint

    default = (
        constants.BEST_YOLO_EXTRACTOR if args.model_id == "yolo" else constants.BEST_EXTRACTOR_WEIGHTS
    )
    if args.promote or not Path(default).exists():
        promote_checkpoint(checkpoint_path, default)
        logger.info("Promoted checkpoint to %s", default)

    if not args.skip_eval:
        from chessvision_tpu.eval.evaluate import evaluate_model

        evaluate_model(
            run=run,
            threshold=args.threshold,
            board_extractor_weights=checkpoint_path,
            board_extractor_model_id=None if args.model_id == "unet" else args.model_id,
        )


if __name__ == "__main__":
    main()
