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

# ---- fast/slow split (VERDICT r4 weak #9: the 34-min suite is why red
# HEADs happen). Modules dominated by interpret-mode Pallas kernels or
# heavy iterative solves are auto-marked `slow`; the default developer
# loop is `pytest -m "not slow" tests/` (<5 min), CI runs everything.
SLOW_MODULES = {
    "test_kstep", "test_kstep_sharded", "test_fixup_kernel",
    "test_pallas_kernel", "test_mode_tpu", "test_topology_adjoint",
    "test_adjoint_invdes", "test_shape_adjoint", "test_checkpoint",
    "test_modulation", "test_nonlinear", "test_mode_anisotropic",
    "test_mode_angled", "test_smatrix", "test_eme",
    "test_mode_solver_extended", "test_projection_diffraction",
    "test_sharding",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: interpret-mode kernel / heavy solver tests "
        "(excluded from the fast loop via -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def tmp_h5(tmp_path):
    return str(tmp_path / "data.hdf5")
