"""Device-mesh parallelism utilities (data-parallel sharding over ICI).

The reference is single-process/single-device (SURVEY.md §2.5); here
scale-out is first-class: batches shard over a ``jax.sharding.Mesh`` and
XLA inserts the collectives.  The scalable axis of this workload is the
batch of boards — there is no sequence axis (SURVEY.md §5.7).
"""

from chessvision_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    initialize_distributed,
    make_global_batch,
    process_local_batch_slice,
    replicate,
    shard_batch,
    spans_processes,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "initialize_distributed",
    "make_global_batch",
    "process_local_batch_slice",
    "replicate",
    "shard_batch",
    "spans_processes",
]
