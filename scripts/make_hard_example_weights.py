"""Write hard-example sample weights onto the classifier train table.

Runs the current promoted classifier over the training squares, scores
each example by the probability it assigns the true class, and persists a
``sample_weight`` column (mean-normalized, focal-style w ∝ base + (1 -
p_true)) onto the registered train table.  The trainers pick the column
up via ``--use-sample-weights`` (train/tables.sample_weights_for_ids) —
the runstore analogue of the reference's 3LC weight-editing curation loop
(reference notebooks/filter.ipynb + tlc sampler semantics).

Usage: python scripts/make_hard_example_weights.py [--boost 9.0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--boost", type=float, default=9.0, help="weight multiplier at p_true=0")
    parser.add_argument("--weights", default="weights/best_classifier.npz")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from chessvision_tpu import models
    from chessvision_tpu.checkpoint import load_checkpoint
    from chessvision_tpu.train import data as data_lib
    from chessvision_tpu.train.tables import CLS_PROJECT, get_or_create_classification_tables
    from chessvision_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    data = data_lib.load_squares()
    model, _ = models.create_classifier("resnet18")
    loaded, meta = load_checkpoint(args.weights)
    variables = {"params": loaded["params"], "batch_stats": loaded["batch_stats"]}

    @jax.jit
    def p_true_batch(imgs, labs):
        logits = model.apply(variables, imgs)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.take_along_axis(probs, labs[:, None], axis=1)[:, 0]

    ps = []
    n = len(data.train_labels)
    for idx in data_lib.batches(n, 512):
        idx, real = data_lib.pad_indices(idx, 512)
        imgs = jnp.asarray(data.train_images[idx], jnp.float32)[..., None] / 255.0
        labs = jnp.asarray(data.train_labels[idx])
        ps.append(np.asarray(p_true_batch(imgs, labs))[:real])
    p_true = np.concatenate(ps)

    w = 1.0 + args.boost * (1.0 - p_true)
    w = w / w.mean()
    tables = get_or_create_classification_tables()
    train = tables["train"]
    lookup = dict(zip(data.train_ids, w))
    aligned = np.asarray([lookup.get(e, 1.0) for e in train["example_id"]], np.float64)
    train.with_column("sample_weight", aligned).save()
    hard = int((p_true < 0.9).sum())
    print(
        f"wrote sample_weight to {train.url}: {len(aligned)} rows, "
        f"{hard} hard examples (p_true<0.9), weight range "
        f"[{aligned.min():.3f}, {aligned.max():.3f}]"
    )


if __name__ == "__main__":
    main()
