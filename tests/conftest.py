"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding paths are
exercised without TPU hardware (the SURVEY.md section 4 test strategy).  The
environment must be set before the first jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# This image's jax build pins the experimental 'axon' TPU-tunnel platform and
# ignores the JAX_PLATFORMS env var; force CPU through the config API so the
# suite is hermetic (and fast) without TPU hardware.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped: every test draws the same deterministic stream
    # regardless of execution order.
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def sample_clouds():
    """The bundled reference sample pair (131072 x 3 each)."""
    c1 = np.load("/root/reference/python/point_clouds/sample_pc_1.npy")
    c2 = np.load("/root/reference/python/point_clouds/sample_pc_2.npy")
    return c1.astype(np.float32), c2.astype(np.float32)


@pytest.fixture(scope="session")
def frame_clouds():
    """The bundled Ouster frames 804/805 (65536 x 3 each)."""
    c1 = np.load("/root/reference/src/sample_data/frame_804.npy")
    c2 = np.load("/root/reference/src/sample_data/frame_805.npy")
    return c1.astype(np.float32), c2.astype(np.float32)
