"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Unit tests exercise numerics and sharding, not TPU wall-clock; forcing the
CPU platform keeps them hermetic and lets multi-chip sharding tests run on
one host.  Must be set before jax initializes.
"""

import os

# Force (not setdefault): the launch environment may export
# JAX_PLATFORMS=axon and would silently run the suite on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
