"""Per-stage FLOP accounting → the MFU table in ARCHITECTURE.md.

FLOP counts come from XLA's cost analysis of the EXACT compiled programs
(the same jitted functions the trainers/engine run), lowered on the CPU
backend at a small reference batch and scaled linearly to the bench
batch (HLO flop counts are linear in the batch dimension for every
program here — pure per-sample convs/matmuls/elementwise).  Times are
the TPU-measured numbers from RESULTS.md / the bench JSON, passed on the
command line so the table always states its provenance.

v5e peaks used: 197e12 bf16 MXU FLOP/s (matmul/conv — the models compute
in bf16), 3.85e12 f32 VPU ops/s (elementwise; warp derivation in
ARCHITECTURE.md).  MFU here = achieved FLOP/s ÷ MXU peak, the standard
definition; stages dominated by VPU work (the warp) are reported against
the VPU peak and labelled.

Usage (defaults are the round-3/4 recorded numbers):
    python scripts/mfu_accounting.py
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

MXU_PEAK = 197e12  # v5e bf16 FLOP/s
VPU_PEAK = 3.85e12  # v5e f32 lane-ops/s (ARCHITECTURE.md derivation)


def _flops(lowerable, *args) -> float:
    """HLO flop count of the compiled program (CPU backend)."""
    compiled = jax.jit(lowerable).lower(*args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns [dict]
        costs = costs[0]
    return float(costs["flops"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unet-step-ms", type=float, default=74.1, help="B=32 TPU ms (RESULTS.md)")
    ap.add_argument("--cls-step-ms", type=float, default=7.4, help="B=256 TPU ms (RESULTS.md)")
    ap.add_argument(
        "--compute-boards-per-sec", type=float, default=829.7,
        help="B=1024 device-resident e2e of the SHIPPING (arbitrate) program "
        "(BENCH_r04; refresh from the latest bench/sweep)",
    )
    ap.add_argument(
        "--refine", default=None,
        help="engine refine mode to account (default: the shipping default)",
    )
    ap.add_argument("--warp-ms-128", type=float, default=55.0, help="warp ms per 128 boards")
    args = ap.parse_args()

    from chessvision_tpu import engine as eng_mod
    from chessvision_tpu.models import create_classifier, create_extractor
    from chessvision_tpu.train import steps

    rng = jax.random.PRNGKey(0)

    # ---- models at their pipeline shapes (bf16 compute, like production)
    unet, _ = create_extractor("unet")
    resnet, _ = create_classifier("resnet18")
    unet_vars = unet.init(rng, jnp.zeros((1, 256, 256, 3), jnp.float32), train=False)
    cls_vars = resnet.init(rng, jnp.zeros((1, 64, 64, 1), jnp.float32), train=False)

    # ---- train steps: lower the REAL jitted step at a small batch, scale
    b_ref_seg, b_seg = 4, 32
    seg_state = steps.TrainState.create(
        apply_fn=unet.apply,
        params=unet_vars["params"],
        batch_stats=unet_vars.get("batch_stats", {}),
        tx=steps.make_optimizer("rmsprop", 1e-4),
    )
    seg_step = steps.make_seg_train_step()
    seg_flops = (
        _flops(
            lambda s, i, m: seg_step(s, i, m),
            seg_state,
            jnp.zeros((b_ref_seg, 256, 256, 3), jnp.float32),
            jnp.zeros((b_ref_seg, 256, 256), jnp.float32),
        )
        * b_seg
        / b_ref_seg
    )

    b_ref_cls, b_cls = 32, 256
    cls_state = steps.TrainState.create(
        apply_fn=resnet.apply,
        params=cls_vars["params"],
        batch_stats=cls_vars.get("batch_stats", {}),
        tx=steps.make_optimizer("adam", 1e-3),
    )
    cls_step = steps.make_cls_train_step()
    cls_flops = (
        _flops(
            lambda s, i, l: cls_step(s, i, l),
            cls_state,
            jnp.zeros((b_ref_cls, 64, 64, 1), jnp.float32),
            jnp.zeros((b_ref_cls,), jnp.int32),
        )
        * b_cls
        / b_ref_cls
    )

    # ---- fused inference pipeline (packed path = the compute benchmark's
    # program): flops/board from a small lowering
    b_ref_inf = 4
    engine = eng_mod.Engine(unet, unet_vars, resnet, cls_vars, refine_grid=args.refine)
    comp = np.zeros((b_ref_inf, 256, 256, 3), np.uint8)
    gray = np.zeros((b_ref_inf, 512, 512), np.uint8)
    pipe_flops_per_board = (
        _flops(
            lambda c, g: engine._packed_program()(c, g, jnp.float32(0.5)),
            jnp.asarray(comp),
            jnp.asarray(gray),
        )
        / b_ref_inf
    )
    # forward-only model flops at inference shapes (for stage attribution)
    unet_fwd_per_board = _flops(
        lambda i: unet.apply(unet_vars, i, train=False),
        jnp.zeros((1, 256, 256, 3), jnp.float32),
    )
    cls_fwd_per_board = _flops(
        lambda i: resnet.apply(cls_vars, i, train=False),
        jnp.zeros((64, 64, 64, 1), jnp.float32),
    )

    rows = []

    def row(stage, flops, seconds, peak, peak_name):
        achieved = flops / seconds
        rows.append((stage, flops, seconds * 1000, achieved, 100 * achieved / peak, peak_name))

    row("UNet train step (B=32)", seg_flops, args.unet_step_ms / 1000, MXU_PEAK, "MXU")
    row("ResNet18 train step (B=256)", cls_flops, args.cls_step_ms / 1000, MXU_PEAK, "MXU")
    pipe_seconds_per_board = 1.0 / args.compute_boards_per_sec
    row(
        "Fused inference pipeline (per board, B=1024)",
        pipe_flops_per_board,
        pipe_seconds_per_board,
        MXU_PEAK,
        "MXU",
    )
    warp_ops_per_board = 2 * 512**3 * 5.5  # ARCHITECTURE.md: 5–6 VPU ops/grid point
    row(
        "  · warp stage (VPU-bound, per board)",
        warp_ops_per_board,
        args.warp_ms_128 / 128 / 1000,
        VPU_PEAK,
        "VPU",
    )

    print(f"{'stage':<46} {'GFLOP':>9} {'ms':>8} {'TFLOP/s':>9} {'% peak':>7}")
    for stage, flops, ms, achieved, pct, peak_name in rows:
        print(
            f"{stage:<46} {flops / 1e9:>9.2f} {ms:>8.2f} {achieved / 1e12:>9.2f} "
            f"{pct:>6.1f} ({peak_name})"
        )
    # arbitrate classifies BOTH geometries (original + grid-refined), so the
    # classifier's forward flops appear twice in the shipping program
    n_cls = 2 if engine._refine == "arbitrate" else 1
    cls_total = cls_fwd_per_board * n_cls
    print(
        f"\nstage attribution of pipeline flops/board ({engine._refine} mode): UNet fwd "
        f"{unet_fwd_per_board / 1e9:.2f} GFLOP ({100 * unet_fwd_per_board / pipe_flops_per_board:.0f}%), "
        f"classifier fwd (64 squares × {n_cls} pass{'es' if n_cls > 1 else ''}) "
        f"{cls_total / 1e9:.2f} GFLOP "
        f"({100 * cls_total / pipe_flops_per_board:.0f}%), "
        f"rest (resize/quad/warp/gridfix/threshold) "
        f"{(pipe_flops_per_board - unet_fwd_per_board - cls_total) / 1e9:.2f} GFLOP"
    )


if __name__ == "__main__":
    main()
