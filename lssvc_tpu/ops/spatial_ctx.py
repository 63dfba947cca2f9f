"""Active spatial-partitioning context for the warp dispatchers.

When a mesh is set here, `ops.warp_pallas.flow_warp_auto` /
`grouped_warp_auto` route through the shard_map halo-exchange wrappers in
`parallel/spatial.py` instead of warping the (H-sharded) tensor globally:
each shard exchanges `halo` boundary rows with its mesh neighbours and
runs the normal tiered warp (Pallas kernels on TPU) on its own strip.
The flag is read at TRACE time — activate it around the trace of a
spatially-sharded program (see `parallel.spatial.make_spatial_forward`),
not around calls of an already-jitted function.

Kept in its own leaf module so ops.warp_pallas does not import
parallel.spatial at module load (parallel.spatial imports ops.warp).
"""

from __future__ import annotations

import contextlib

MESH = None
AXIS = "h"
HALO = 8          # single-flow warps: must bound |flow_y|
HALO_GROUPED = 44  # OffsetDiversity units (offsets are 40*tanh-bounded)


def active() -> bool:
    return MESH is not None


@contextlib.contextmanager
def spatial(mesh, axis: str = "h", halo: int = 8, halo_grouped: int = 44):
    """Enable spatial warp routing while tracing a sharded program."""
    global MESH, AXIS, HALO, HALO_GROUPED
    prev = (MESH, AXIS, HALO, HALO_GROUPED)
    MESH, AXIS, HALO, HALO_GROUPED = mesh, axis, halo, halo_grouped
    try:
        yield
    finally:
        MESH, AXIS, HALO, HALO_GROUPED = prev


@contextlib.contextmanager
def cleared():
    """Disable routing inside the per-shard warp body (recursion guard)."""
    global MESH
    prev = MESH
    MESH = None
    try:
        yield
    finally:
        MESH = prev
