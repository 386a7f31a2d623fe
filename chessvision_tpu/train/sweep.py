"""Hyperparameter sweep runner + parallel-coordinates report.

Replaces the reference's bash grid loop (scripts/bin/
train_board_extractor_sweep.sh: lr × {1,10,100,1000}·1e-7, thresholds
{0.3,0.5,0.7}, ±sample-weights) and the plotly sweep viewer
(scripts/plot_sweep.py) with a Python grid runner over the trainers and a
matplotlib parallel-coordinates plot sourced from runstore run parameters.

Run: python -m chessvision_tpu.train.sweep --target unet --epochs 2 ...
"""

from __future__ import annotations

import argparse
import itertools
import logging
from pathlib import Path
from typing import Any, Sequence

from chessvision_tpu.runstore.runs import Run, list_runs
from chessvision_tpu.runstore.tables import store_root

logger = logging.getLogger(__name__)


def run_sweep(
    target: str = "unet",
    learning_rates: Sequence[float] = (1e-5, 3e-5, 1e-4),
    thresholds: Sequence[float] = (0.3, 0.5, 0.7),
    sample_weights: Sequence[bool] = (False, True),
    epochs: int = 5,
    sweep_id: int = 0,
    **kwargs: Any,
) -> list[Run]:
    """Grid sweep over the segmentation or classification trainer."""
    runs: list[Run] = []
    if target == "unet":
        from chessvision_tpu.train.train_unet import train_model

        grid = list(itertools.product(learning_rates, thresholds, sample_weights))
        for i, (lr, thr, sw) in enumerate(grid):
            name = f"sweep{sweep_id}-{i:03d}-lr{lr:g}-thr{thr:g}-sw{int(sw)}"
            logger.info("Sweep %d/%d: %s", i + 1, len(grid), name)
            run, _ = train_model(
                epochs=epochs,
                learning_rate=lr,
                threshold=thr,
                use_sample_weights=sw,
                run_name=name,
                **kwargs,
            )
            run.set_parameters({"sweep_id": sweep_id})
            runs.append(run)
    elif target == "classifier":
        from chessvision_tpu.train.train_classifier import train_model

        grid = list(itertools.product(learning_rates, sample_weights))
        for i, (lr, sw) in enumerate(grid):
            name = f"sweep{sweep_id}-{i:03d}-lr{lr:g}-sw{int(sw)}"
            run, _ = train_model(
                epochs=epochs, learning_rate=lr, use_sample_weights=sw, run_name=name, **kwargs
            )
            run.set_parameters({"sweep_id": sweep_id})
            runs.append(run)
    else:
        raise ValueError(f"unknown sweep target {target}")
    return runs


def collect_sweep_data(project: str, sweep_id: int | None = None) -> list[dict[str, Any]]:
    """Pull run parameters for a sweep (plot_sweep.py:26-37)."""
    rows = []
    for name in list_runs(project):
        run = Run(project, name)
        p = run.parameters
        if sweep_id is not None and p.get("sweep_id") != sweep_id:
            continue
        rows.append(
            {
                "run": name,
                "learning_rate": p.get("learning_rate"),
                "threshold": p.get("threshold"),
                "use_sample_weights": p.get("use_sample_weights"),
                "best_val_score": p.get("best_val_score"),
            }
        )
    return rows


def plot_sweep(project: str, sweep_id: int | None = None, out_path: str | None = None) -> str:
    """Parallel-coordinates plot of sweep results (plot_sweep.py:43-106,
    matplotlib instead of plotly)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rows = [r for r in collect_sweep_data(project, sweep_id) if r["best_val_score"] is not None]
    if not rows:
        raise ValueError("no sweep runs found")
    dims = ["learning_rate", "threshold", "use_sample_weights", "best_val_score"]
    data = np.array(
        [[float(r[d]) if r[d] is not None else np.nan for d in dims] for r in rows], float
    )
    # drop dimensions absent from this sweep (e.g. threshold for classifiers)
    keep = [i for i in range(len(dims)) if not np.isnan(data[:, i]).all()]
    dims = [dims[i] for i in keep]
    data = data[:, keep]
    mins = np.nanmin(data, axis=0)
    maxs = np.nanmax(data, axis=0)
    span = np.where(maxs - mins == 0, 1, maxs - mins)
    norm = (data - mins) / span

    fig, ax = plt.subplots(figsize=(10, 5))
    scores = data[:, -1]
    smin, smax = np.nanmin(scores), np.nanmax(scores)
    for i in range(len(rows)):
        c = plt.cm.viridis((scores[i] - smin) / (smax - smin + 1e-12))
        ax.plot(range(len(dims)), norm[i], color=c, alpha=0.7)
    ax.set_xticks(range(len(dims)))
    ax.set_xticklabels(dims, rotation=15)
    for i, d in enumerate(dims):
        ax.text(i, -0.08, f"{mins[i]:g}", transform=ax.get_xaxis_transform(), ha="center", fontsize=8)
        ax.text(i, 1.02, f"{maxs[i]:g}", transform=ax.get_xaxis_transform(), ha="center", fontsize=8)
    ax.set_title(f"Sweep results: {project}" + (f" (sweep {sweep_id})" if sweep_id is not None else ""))
    ax.set_yticks([])
    out = out_path or str(store_root() / "projects" / project / f"sweep_{sweep_id or 'all'}.png")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    logger.info("Sweep plot written to %s", out)
    return out


def main() -> None:
    from chessvision_tpu.utils import setup_logger

    parser = argparse.ArgumentParser()
    parser.add_argument("--target", default="unet", choices=["unet", "classifier"])
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--sweep-id", type=int, default=0)
    parser.add_argument("--learning-rates", type=float, nargs="+", default=[1e-5, 3e-5, 1e-4])
    parser.add_argument("--thresholds", type=float, nargs="+", default=[0.3, 0.5, 0.7])
    parser.add_argument("--plot-only", action="store_true")
    args = parser.parse_args()
    setup_logger("chessvision_tpu")
    project = "chessvision-segmentation" if args.target == "unet" else "chessvision-classification"
    if not args.plot_only:
        run_sweep(
            target=args.target,
            epochs=args.epochs,
            sweep_id=args.sweep_id,
            learning_rates=args.learning_rates,
            thresholds=args.thresholds,
        )
    plot_sweep(project, args.sweep_id)


if __name__ == "__main__":
    main()
