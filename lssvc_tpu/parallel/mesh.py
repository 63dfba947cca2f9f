"""Device-mesh helpers.

The codec itself needs no collectives (SURVEY.md §2.3) — fleet-level
parallelism is data parallelism over sequences/frames: a 1-D "data" mesh,
batch sharded on axis 0, parameters replicated.  Gradient all-reduce in the
training step is inserted by XLA from these shardings (no hand-written
collectives, riding ICI).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-axis sharding (leading dim split across the mesh)."""
    return NamedSharding(mesh, PS(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PS())
