"""initialize_distributed behavior: engagement gates and failure modes."""

import jax
import pytest

from chessvision_tpu.parallel import mesh


def test_no_cluster_env_is_noop(monkeypatch) -> None:
    for v in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "CVTPU_DISTRIBUTED",
    ):
        monkeypatch.delenv(v, raising=False)
    assert mesh.initialize_distributed() == jax.process_index()


def test_explicit_bad_coordinator_raises() -> None:
    """A misconfigured explicit multi-host setup must die loudly, not
    silently degrade into independent single-host trainings."""
    if mesh._distributed_initialized:
        pytest.skip("distributed already initialized in this process")
    with pytest.raises(Exception):
        mesh.initialize_distributed(
            coordinator_address="127.0.0.1:1", num_processes=2, process_id=0
        )


def test_env_marker_autodetect_falls_through(monkeypatch) -> None:
    """Pod env markers without a real cluster: best-effort autodetect
    swallows the failure and falls back to local devices."""
    if mesh._distributed_initialized:
        pytest.skip("distributed already initialized in this process")
    monkeypatch.setenv("CVTPU_DISTRIBUTED", "1")
    assert mesh.initialize_distributed() == jax.process_index()
