"""Coordinate-grid helpers (LIIF-style).

Equivalent of the reference remnant `src/utils/liif_utils.py:4-27`: pixel-
center coordinates in [-1, 1] for implicit-function sampling."""

from __future__ import annotations

import jax.numpy as jnp


def make_coord(shape, ranges=None, flatten: bool = True):
    """Coordinates at the centers of an N-D grid."""
    coord_seqs = []
    for i, n in enumerate(shape):
        if ranges is None:
            v0, v1 = -1.0, 1.0
        else:
            v0, v1 = ranges[i]
        r = (v1 - v0) / (2 * n)
        coord_seqs.append(v0 + r + (2 * r) * jnp.arange(n, dtype=jnp.float32))
    grids = jnp.meshgrid(*coord_seqs, indexing="ij")
    ret = jnp.stack(grids, axis=-1)
    if flatten:
        ret = ret.reshape(-1, ret.shape[-1])
    return ret
