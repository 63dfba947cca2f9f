"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Unit tests exercise numerics and sharding, not TPU wall-clock; forcing the
CPU platform keeps them hermetic and lets multi-chip sharding tests run on
one host.  Must be set before jax initializes.
"""

import os

# Force (not setdefault): the launch environment may export
# JAX_PLATFORMS=axon and would silently run the suite on the real chip;
# the axon sitecustomize registers its backend at interpreter start, so the
# jax.config override below is also required (env alone is read too early).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache (per-platform dir, utils/cache.py): the suite is
# dominated by XLA:CPU compiles on this 1-core host; cache hits cut repeat
# runs by minutes.  Entries are keyed by jaxlib version + HLO, so stale
# entries are never wrongly reused after code changes.
from lssvc_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
