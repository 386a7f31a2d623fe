"""Test configuration: force JAX onto an 8-device virtual CPU platform.

Tests must not depend on TPU hardware; multi-chip sharding paths are
exercised on a host-platform device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).  This must run before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
