"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic
(meshes, collectives, pjit) is exercised without TPU hardware.  The host
environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and the axon
plugin registers at interpreter start, so the platform must be forced
back to CPU at the jax.config level — env vars alone lose.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_FAST5 = "/root/reference/radian/data/reads.fast5"


@pytest.fixture(scope="session")
def reads_fast5_path():
    return REFERENCE_FAST5
