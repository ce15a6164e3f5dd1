"""Test harness configuration: 8 virtual CPU devices.

The session environment pins ``JAX_PLATFORMS=axon`` (single real TPU via a
tunnel); eager per-op dispatch over that tunnel is seconds-per-op, so tests
force the host platform with 8 virtual devices for sharding tests. Mirrors
the reference's hermetic-test philosophy (SURVEY.md §4): tiny real runs, no
mocks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
