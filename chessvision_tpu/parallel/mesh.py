"""Mesh construction and sharding helpers.

One canonical mesh axis for this workload: ``data`` (boards).  Model
parameters are replicated (they are ~40 MB — ICI all-gathering them would
cost more than it saves at these sizes); activations shard on the batch
dimension and every stage of the fused pipeline is batch-parallel, so XLA
needs no cross-device collectives on the inference path at all, and a
single psum for gradient all-reduce in training.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_distributed_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Multi-host entry point: join the ``jax.distributed`` cluster so that
    ``jax.devices()`` (and therefore ``create_mesh``) spans every process's
    chips — batch sharding rides ICI within a slice and DCN across hosts,
    with XLA inserting the collectives (scaling-book recipe; the reference
    has no distributed layer to mirror, SURVEY §2.5/§5.8).

    Engages when (a) a coordinator address is passed explicitly, or (b) a
    cluster environment is detected: the generic coordinator env vars, the
    TPU-pod markers jax's own autodetection keys off (TPU_WORKER_HOSTNAMES
    / MEGASCALE_COORDINATOR_ADDRESS), or the CVTPU_DISTRIBUTED=1 opt-in
    (which defers entirely to jax's cluster autodetection).  Plain
    single-process runs are a no-op.  Explicit-argument failures PROPAGATE
    — a misconfigured multi-host job must die loudly, not degrade into N
    independent single-host trainings; only the best-effort autodetect
    path falls through to local devices.  Returns the process index.
    Idempotent."""
    import os

    global _distributed_initialized
    env_cluster = coordinator_address is None and any(
        v in os.environ
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    env_cluster = env_cluster or os.environ.get("CVTPU_DISTRIBUTED") == "1"
    if not _distributed_initialized and coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _distributed_initialized = True
    elif not _distributed_initialized and env_cluster:
        try:
            jax.distributed.initialize()  # full cluster autodetection
            _distributed_initialized = True
        except (ValueError, RuntimeError):
            # best-effort: no real cluster behind the env markers
            pass
    return jax.process_index()


def create_mesh(n_devices: int | None = None, devices: Any = None) -> Mesh:
    """A 1-D data-parallel mesh over ``n_devices`` (default: ALL devices —
    across every process when ``initialize_distributed`` has joined a
    multi-host cluster, so the same code scales from one chip to a pod)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def process_local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, stop) rows of the global batch this process should load —
    the per-host input pipeline for multi-host DP (each host feeds only its
    addressable shard; jax.make_array_from_process_local_data pairs with
    this)."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch // n
    extra = global_batch % n
    start = idx * per + min(idx, extra)
    stop = start + per + (1 if idx < extra else 0)
    return start, stop


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh includes devices of more than one process."""
    return len({d.process_index for d in mesh.devices.ravel()}) > 1


def make_global_batch(mesh: Mesh | None, arr: Any) -> Any:
    """Host batch → batch-sharded global ``jax.Array``.

    The multi-host input-pipeline primitive for the trainers: every
    process computes the SAME full global batch (deterministic seeded
    sampling), but only contributes the rows its own devices shard —
    paired ``process_local_batch_slice`` +
    ``jax.make_array_from_process_local_data``.  Row ownership matches
    the slice because ``create_mesh`` lays devices out in process order
    with equal per-process counts.  Single-process: a plain sharded
    device_put (or jnp.asarray when no mesh)."""
    import jax.numpy as jnp

    if mesh is None:
        return jnp.asarray(arr)
    arr = np.asarray(arr)
    sharding = data_sharding(mesh, arr.ndim)
    if not spans_processes(mesh):
        return jax.device_put(arr, sharding)
    start, stop = process_local_batch_slice(len(arr))
    return jax.make_array_from_process_local_data(sharding, arr[start:stop])


_gather_programs: dict[Mesh, Any] = {}


def host_gather(mesh: Mesh | None, tree: Any) -> Any:
    """Materialize (possibly cross-process sharded) outputs on EVERY host.

    Multi-process meshes: outputs of a sharded program are global arrays
    whose shards live on other hosts — eager numpy conversion (and even
    eager slicing) is illegal on them.  One jitted identity with replicated
    out_shardings all-gathers them over ICI/DCN, after which every process
    holds the full value.  Single-process (or no mesh): plain np.asarray.
    The inference analogue of the trainers' replicated-metrics reads
    (reference has no multi-process layer to mirror, SURVEY §2.5)."""
    if mesh is None or not spans_processes(mesh):
        return jax.tree.map(np.asarray, tree)
    fn = _gather_programs.get(mesh)
    if fn is None:
        fn = jax.jit(lambda t: t, out_shardings=replicate(mesh))
        _gather_programs[mesh] = fn
    return jax.tree.map(np.asarray, fn(tree))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding that shards ``batch_axis`` over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array in ``tree`` with its batch dim sharded."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(put, tree)


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the batch dim up to a multiple (sharding needs divisibility);
    returns (padded, original_size)."""
    b = batch.shape[0]
    rem = (-b) % multiple
    if rem:
        pad = np.repeat(batch[-1:], rem, axis=0)
        batch = np.concatenate([batch, pad], axis=0)
    return batch, b
