"""Test configuration: run everything on an 8-device virtual CPU mesh so
sharding logic is exercised without TPU hardware (SURVEY.md §4 strategy)."""

import os
import sys

# must be set before jax initializes a backend
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the environment pins JAX_PLATFORMS=axon (remote TPU); tests run on CPU
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def tmp_h5(tmp_path):
    return str(tmp_path / "data.hdf5")
