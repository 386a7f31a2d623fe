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


def create_mesh(n_devices: int | None = None, devices: Any = None) -> Mesh:
    """A 1-D data-parallel mesh over ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


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
