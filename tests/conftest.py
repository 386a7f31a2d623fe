"""Test configuration: force JAX onto an 8-device virtual CPU platform.

Tests must not depend on TPU hardware; multi-chip sharding paths are
exercised on a host-platform device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8).

Note: this environment's sitecustomize registers the TPU ('axon') PJRT
plugin and imports jax at interpreter startup, so setting JAX_PLATFORMS here
is too late — we must override via jax.config before the first backend query.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
