"""Banded-resample Pallas kernel vs the full-width XLA reference
(interpret mode on CPU; the compiled path runs inside the engine on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from chessvision_tpu.ops.pallas_kernels import banded_resample
from chessvision_tpu.ops.warp import _hat_resample_last_axis


def _full(src: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return np.asarray(_hat_resample_last_axis(jnp.asarray(src), jnp.asarray(pos)))


@pytest.mark.parametrize("config", ["wide", "narrow"])
def test_matches_full_resample_in_range(config) -> None:
    rng = np.random.default_rng(0)
    src = rng.random((32, 512)).astype(np.float32)
    base = np.linspace(10, 10 + 511 * 0.9, 512)
    pos = np.stack([base + i for i in range(32)]).astype(np.float32)
    got = np.asarray(
        banded_resample(jnp.asarray(src), jnp.asarray(pos), interpret=True, config=config)
    )
    np.testing.assert_allclose(got, _full(src, pos), atol=1e-4)


@pytest.mark.parametrize("config", ["wide", "narrow"])
def test_matches_full_resample_with_borders(config) -> None:
    rng = np.random.default_rng(1)
    src = rng.random((32, 512)).astype(np.float32)
    pos = np.stack([np.linspace(-3, 514, 512) + 0.3 * i for i in range(32)]).astype(np.float32)
    got = np.asarray(
        banded_resample(jnp.asarray(src), jnp.asarray(pos), interpret=True, config=config)
    )
    np.testing.assert_allclose(got, _full(src, pos), atol=1e-4)


@pytest.mark.parametrize("config", ["wide", "narrow"])
def test_upscale_positions(config) -> None:
    """Scale < 1 (zoom-in): narrow band, exactness preserved."""
    rng = np.random.default_rng(2)
    src = rng.random((32, 512)).astype(np.float32)
    pos = np.stack([200 + np.linspace(0, 100, 512)] * 32).astype(np.float32)
    got = np.asarray(
        banded_resample(jnp.asarray(src), jnp.asarray(pos), interpret=True, config=config)
    )
    np.testing.assert_allclose(got, _full(src, pos), atol=1e-4)


def test_shape_constraints_assert() -> None:
    with pytest.raises(AssertionError):
        banded_resample(jnp.zeros((31, 512)), jnp.zeros((31, 512)), interpret=True)
    with pytest.raises(AssertionError):
        banded_resample(jnp.zeros((32, 128)), jnp.zeros((32, 128)), interpret=True)
