"""Worker process for the real 2-process ``jax.distributed`` test.

Launched (not collected) by ``tests/test_mesh_distributed.py``: each of the
two worker processes forces the CPU platform with 4 virtual devices, joins
the cluster through ``initialize_distributed``, builds the global 8-device
mesh, feeds its process-local slice of a deterministic global batch through
``jax.make_array_from_process_local_data`` + ``process_local_batch_slice``,
runs ONE sharded segmentation train step, and writes the (replicated) loss
/ dice / updated-param norm to a JSON file for the parent to compare
against the single-process step.  This executes the multi-host layer for
real — coordinator service, cross-process mesh, DCN-spanning batch
sharding — on localhost (SURVEY §2.5/§5.8; the reference's nearest
analogue is DataLoader worker processes, train_unet.py:186-205).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["step", "trainer", "engine"], default="step")
    args = ap.parse_args()

    # per-process virtual CPU device count (replace any inherited setting)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    # the image's sitecustomize preloads the TPU plugin; env vars are too
    # late — switch platforms via jax.config before any backend query
    jax.config.update("jax_platforms", "cpu")

    from chessvision_tpu.parallel.mesh import (
        create_mesh,
        data_sharding,
        initialize_distributed,
        process_local_batch_slice,
        replicate,
    )

    # must run before backends initialize
    idx = initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    assert idx == args.process_id, (idx, args.process_id)
    assert jax.process_count() == args.num_processes
    n_global = args.local_devices * args.num_processes
    assert len(jax.devices()) == n_global, len(jax.devices())
    assert len(jax.local_devices()) == args.local_devices

    import jax.numpy as jnp
    import numpy as np

    if args.mode == "trainer":
        return run_trainer_mode(args)
    if args.mode == "engine":
        return run_engine_mode(args)

    from chessvision_tpu import models
    from chessvision_tpu.train.steps import (
        TrainState,
        make_optimizer,
        make_seg_train_step,
    )

    # identical seeds on every process → identical init; replicate spans
    # the full (cross-process) mesh
    unet, _ = models.create_extractor("unet", base=4)
    variables = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    tx = make_optimizer("rmsprop", 1e-4, momentum=0.999, gradient_clipping=1.0)
    state = TrainState.create(
        apply_fn=unet.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    mesh = create_mesh()
    assert len(mesh.devices.ravel()) == n_global
    state = jax.device_put(state, replicate(mesh))

    # the global batch every process can *construct*, but each only
    # *loads* (device_puts) its own slice — the multi-host input pipeline
    global_batch = 8
    rng = np.random.default_rng(0)
    images = rng.random((global_batch, 32, 32, 3)).astype(np.float32)
    masks = (rng.random((global_batch, 32, 32)) > 0.5).astype(np.float32)
    start, stop = process_local_batch_slice(global_batch)
    imgs_g = jax.make_array_from_process_local_data(
        data_sharding(mesh, 4), images[start:stop]
    )
    masks_g = jax.make_array_from_process_local_data(
        data_sharding(mesh, 3), masks[start:stop]
    )
    assert imgs_g.shape == (global_batch, 32, 32, 3)

    step = make_seg_train_step(mesh)
    new_state, metrics = step(state, imgs_g, masks_g)

    # scalars/params are fully replicated → every process can read them
    sq = [jnp.vdot(x, x) for x in jax.tree.leaves(new_state.params)]
    pnorm = jnp.sqrt(jnp.sum(jnp.stack(sq)))
    record = {
        "process_id": args.process_id,
        "process_count": int(jax.process_count()),
        "n_devices": int(len(jax.devices())),
        "batch_slice": [int(start), int(stop)],
        "loss": float(np.asarray(metrics["loss"])),
        "dice": float(np.asarray(metrics["dice"])),
        "param_norm": float(np.asarray(pnorm)),
    }
    with open(f"{args.out}.{args.process_id}.json", "w") as f:
        json.dump(record, f)
    jax.distributed.shutdown()
    return 0


def build_parity_engine(mesh):
    """The Engine configuration shared by the 2-process workers and the
    single-process reference: a fixed-quadrangle stub extractor (so
    found=True and the warp geometry is deterministic) plus a REAL
    seeded random-init classifier (so probabilities — and the FENs built
    from them — depend on actual warped pixel content, which is what
    crosses the process boundary).

    Grid refinement runs the SHIPPING default — "arbitrate" — with the
    chunk forced to 2 so the 8-row padded batch exercises the lax.scan
    chunked tail (4 chunks) ACROSS processes: per-process input slicing
    feeding a scan whose leading axis cannot stay batch-sharded is
    exactly the path a single-process dryrun cannot stress (r4 verdict
    missing #2).  The classifier is the tiny YoloCls (width 8): the
    sharding/slicing semantics under test are classifier-independent,
    and the full ResNet18 arbitrate program on the emulated-bf16 CPU
    mesh measures 250 s/call (vs ~7 s with the tiny one), which would
    blow the worker timeout for zero extra sharding coverage."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from chessvision_tpu import models
    from chessvision_tpu.engine import Engine

    class FixedQuadExtractor:
        """+8 logits inside a fixed quadrangle, -8 outside (input-independent)."""

        def __init__(self) -> None:
            import cv2

            quad = np.array([[32, 28], [224, 30], [226, 228], [30, 226]], np.int32)
            mask = np.zeros((256, 256), np.uint8)
            cv2.fillConvexPoly(mask, quad, 255)
            self._logits = jnp.asarray(np.where(mask > 0, 8.0, -8.0), jnp.float32)

        def apply(self, variables, x, **kw):
            b = x.shape[0]
            return jnp.broadcast_to(self._logits[None, :, :, None], (b, 256, 256, 1))

    classifier, cl_spec = models.create_classifier("yolo", dtype=jnp.float32, width=8)
    cl_vars = classifier.init(
        jax.random.PRNGKey(11), jnp.zeros((1, 64, 64, 1), jnp.float32)
    )
    return Engine(
        FixedQuadExtractor(),
        {},
        classifier,
        cl_vars,
        classifier_outputs_probabilities=cl_spec.outputs_probabilities,
        mesh=mesh,
        refine_grid="arbitrate",
        arbitrate_chunk=2,
    )


def parity_engine_batch():
    """Deterministic 6-image uint8 batch (6 ∤ 8 exercises mesh padding)."""
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (6, 256, 256, 3), np.uint8)


def run_engine_mode(args) -> int:
    """Run the INFERENCE Engine over the 2-process mesh — process_batch
    with the input fed through make_global_batch (each process loads only
    its row slice) and outputs all-gathered back to every host — writing
    FENs/found/probability checksums for the parent's parity assertion
    against a single-process run.  (Reference analogue: pod-scale batch
    enrichment, process_pipeline.py:249.)"""
    import jax
    import numpy as np

    from chessvision_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    engine = build_parity_engine(mesh)
    batch = parity_engine_batch()
    result = engine.process_batch(batch, threshold=0.5)

    record = {
        "process_id": args.process_id,
        "process_count": int(jax.process_count()),
        "n_devices": int(len(jax.devices())),
        "found": [bool(f) for f in result.board_found],
        "fens": list(result.fens),
        "prob_sum": float(np.float64(result.probabilities.sum())),
        "prob_sha": _array_sha(result.probabilities),
        "quad_sha": _array_sha(result.quadrangle),
    }
    with open(f"{args.out}.{args.process_id}.json", "w") as f:
        json.dump(record, f)
    jax.distributed.shutdown()
    return 0


def _array_sha(a) -> str:
    import hashlib

    import numpy as np

    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()


def synthetic_seg_data():
    """Tiny deterministic segmentation dataset (same on every process)."""
    import numpy as np

    from chessvision_tpu.train.data import SegmentationData

    rng = np.random.default_rng(123)
    imgs = rng.integers(0, 256, (24, 256, 256, 3), np.uint8)
    masks = (rng.random((24, 256, 256)) > 0.7).astype(np.float32)
    return SegmentationData(
        train_images=imgs[:16],
        train_masks=masks[:16],
        val_images=imgs[16:],
        val_masks=masks[16:],
        train_ids=[f"t{i}" for i in range(16)],
        val_ids=[f"v{i}" for i in range(8)],
    )


def run_trainer_mode(args) -> int:
    """Run the REAL `train_unet.train_model` loop under the 2-process
    cluster (synthetic data, tiny UNet) — validates the trainer's
    multi-host data pipeline (make_global_batch), process-0-only
    checkpoint/run ownership, and loss/param parity with single-process
    training (asserted by the parent test)."""
    import tempfile
    import os as _os

    import jax
    import jax.numpy as jnp
    import numpy as np

    _os.environ.setdefault("CVTPU_STORE_ROOT", tempfile.mkdtemp(prefix="cvtpu-dist-"))

    from chessvision_tpu.train import data as data_lib
    from chessvision_tpu.train import train_unet

    data_lib.load_board_extraction = lambda *a, **k: synthetic_seg_data()

    run, checkpoint_path = train_unet.train_model(
        epochs=2,
        batch_size=8,
        base=4,
        model_dtype=jnp.float32,
        collection_frequency=1,  # exercises the multi-process skip path
        patience=99,
        validations_per_epoch=2,
        augment=False,
        use_mesh=True,
        seed=7,
    )
    from pathlib import Path

    is_main = jax.process_index() == 0
    ck = Path(checkpoint_path)
    record = {
        "process_id": args.process_id,
        "process_count": int(jax.process_count()),
        "is_main": is_main,
        "checkpoint_exists": ck.exists(),
        "run_is_null": type(run).__name__ == "NullRun",
    }
    if ck.exists():
        from chessvision_tpu.checkpoint import load_checkpoint

        variables, meta = load_checkpoint(ck)
        sq = [float(np.vdot(x, x)) for x in jax.tree.leaves(variables["params"])]
        record["param_norm"] = float(np.sqrt(np.sum(sq)))
        record["best_val_score"] = float(meta.get("best_val_score", float("nan")))
    with open(f"{args.out}.{args.process_id}.json", "w") as f:
        json.dump(record, f)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
