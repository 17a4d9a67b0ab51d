"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic
(meshes, collectives, pjit) is exercised without TPU hardware.  These env
vars must be set before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_FAST5 = "/root/reference/radian/data/reads.fast5"


@pytest.fixture(scope="session")
def reads_fast5_path():
    return REFERENCE_FAST5
