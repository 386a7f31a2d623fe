"""Training-throughput benchmark: step time / images/s / projected epoch
wall-clock for both trainers at their canonical configs.

The reference's training perf record is "<10 minutes per model on a modern
GPU" (reference README.md:153) and the legacy per-step times in
app/computeroot/README.md:97-105; BASELINE.md carries both rows.  This
script produces the repo-side counterparts on the TPU (RESULTS.md records
them).

Prints one JSON line per benched trainer:
  {"trainer": "unet", "step_ms": ..., "images_per_sec": ...,
   "epoch_s_projected": ..., ...}

Steps are timed with synthetic device-resident batches — this measures the
train-step program (fwd+bwd+update, the part the reference's numbers
describe), not host data loading, which overlaps compute in both stacks.
A host transfer per step forces real completion on the tunneled backend
(jax.block_until_ready returns early there, CLAUDE.md).

Run:  python scripts/bench_training.py [--quick] [--trainer unet|classifier|both]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

# canonical dataset sizes (train split of the checked-in data:
# 631 board-extraction images × 90%, 8931 training squares)
N_TRAIN_SEG = 567
N_TRAIN_CLS = 8931


def bench_unet(quick: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from chessvision_tpu import models
    from chessvision_tpu.train.steps import TrainState, make_optimizer, make_seg_train_step

    batch, size, base = (4, 64, 8) if quick else (32, 256, 32)
    unet, _ = models.create_extractor("unet", base=base)
    variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32))
    tx = make_optimizer("rmsprop", 3e-5, weight_decay=1e-8, momentum=0.999, gradient_clipping=1.0)
    state = TrainState.create(
        apply_fn=unet.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=tx,
    )
    step = make_seg_train_step()
    key = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    masks = (jax.random.uniform(key, (batch, size, size)) > 0.5).astype(jnp.float32)

    state, m = step(state, imgs, masks)  # compile
    float(m["loss"])
    iters = 3 if quick else 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, imgs, masks)
    float(m["loss"])  # host transfer: the only reliable sync here
    dt = (time.perf_counter() - t0) / iters
    steps_per_epoch = N_TRAIN_SEG // batch
    return {
        "trainer": "unet",
        "batch_size": batch,
        "image_size": size,
        "step_ms": round(dt * 1000, 2),
        "images_per_sec": round(batch / dt, 1),
        "steps_per_epoch": steps_per_epoch,
        "epoch_s_projected": round(dt * steps_per_epoch, 1),
        "epochs_20_min_projected": round(dt * steps_per_epoch * 20 / 60, 1),
        "backend": jax.default_backend(),
    }


def bench_classifier(quick: bool, batch: int | None = None, augment: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from chessvision_tpu import models
    from chessvision_tpu.train.steps import TrainState, make_cls_train_step, make_optimizer
    from chessvision_tpu.train.augment import augment_classification_batch

    batch = batch or (16 if quick else 256)
    cls, _ = models.create_classifier("resnet18")
    variables = cls.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32))
    state = TrainState.create(
        apply_fn=cls.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=make_optimizer("adam", 1e-3),
    )
    step = make_cls_train_step()
    key = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(key, (batch, 64, 64, 1), jnp.float32)
    labels = jnp.arange(batch) % 13

    # the production loop augments every batch on device — include it
    # (disable with augment=False to attribute step time)
    imgs_aug = augment_classification_batch(key, imgs) if augment else imgs
    state, m = step(state, imgs_aug, labels)  # compile
    float(m["loss"])
    iters = 3 if quick else 20
    t0 = time.perf_counter()
    for i in range(iters):
        imgs_aug = (
            augment_classification_batch(jax.random.fold_in(key, i), imgs) if augment else imgs
        )
        state, m = step(state, imgs_aug, labels)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    steps_per_epoch = N_TRAIN_CLS // batch
    return {
        "trainer": "classifier",
        "batch_size": batch,
        "image_size": 64,
        "step_ms": round(dt * 1000, 2),
        "images_per_sec": round(batch / dt, 1),
        "steps_per_epoch": steps_per_epoch,
        "epoch_s_projected": round(dt * steps_per_epoch, 1),
        "epochs_10_min_projected": round(dt * steps_per_epoch * 10 / 60, 1),
        "backend": jax.default_backend(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny config for CPU smoke runs")
    ap.add_argument("--trainer", choices=["unet", "classifier", "both"], default="both")
    ap.add_argument("--cls-batch", type=int, default=None, help="override classifier batch size")
    ap.add_argument(
        "--no-augment", action="store_true", help="skip on-device augmentation (attribution)"
    )
    args = ap.parse_args()

    if args.trainer in ("unet", "both"):
        print(json.dumps(bench_unet(args.quick)), flush=True)
    if args.trainer in ("classifier", "both"):
        print(
            json.dumps(
                bench_classifier(args.quick, batch=args.cls_batch, augment=not args.no_augment)
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
