"""Multi-chip serving: N concurrent video streams, one (or more) per device.

The reference scales evaluation with a spawn-based process pool placing one
sequence per GPU (`/root/reference/test.py:685-748`).  The TPU-native
equivalent is a single sharded program over a 1-D device mesh: the stream
batch is sharded on axis 0, parameters are replicated, and each device runs
the whole two-layer codec on its own stream — no collectives in the frame
loop (the codec needs none, SURVEY.md §2.3), so scaling is linear over ICI
and the per-frame DPB stays resident on its device.

`shard_map` (not plain jit-with-shardings) so each shard computes its OWN
scalar bit counts — the serving API returns per-stream bits, which a
jit-sharded `forward_one_frame` cannot (its bit counts are global sums).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as PS

from ..models import lssvc as lssvc_model
from .mesh import make_mesh

from .spatial import _shard_map_norep


def make_serving_step(mesh=None, shape_hr=(1152, 1920), scale_factor=2.0,
                      pad_size=(0, 0, 0, 0), axis: str = "data"):
    """Returns step(params, x_bl, x_el, dpb) -> (dpb', bits) where every
    array is stream-batch-major, the batch is sharded over the mesh, and
    bits has shape (B, 2) = per-stream (bit_bl, bit_el).

    Requires B == mesh size (one stream per device): forward_one_frame's
    bit counts are sums over the shard's WHOLE local batch, so multiple
    streams per device would silently report per-device aggregates as if
    they were per-stream values.  serve_streams asserts this.

    The DPB dict uses the model's own keys (ref_frame_bl/el,
    ref_feature_bl/el); feed the returned dpb' to the next call — frames of
    one stream stay serial (codec dependency), streams run in parallel.
    """
    mesh = mesh or make_mesh()

    def one(params, x_bl, x_el, dpb):
        out = lssvc_model.forward_one_frame(
            params, x_bl, x_el, dpb["ref_frame_bl"], dpb["ref_frame_el"],
            dpb["ref_feature_bl"], dpb["ref_feature_el"],
            shape_hr, scale_factor, pad_size)
        bits = jnp.stack([out["bit_bl"], out["bit_el"]])[None]  # (1, 2)
        return out["dpb"], bits

    data = PS(axis)
    fn = _shard_map_norep(one, mesh, (PS(), data, data, data), (data, data))
    return jax.jit(fn)


def serve_streams(params, frames_bl, frames_el, dpb0, mesh=None,
                  shape_hr=(1152, 1920), scale_factor=2.0,
                  pad_size=(0, 0, 0, 0)):
    """Drive T frames of B concurrent streams; returns (final dpb, (T, B, 2)
    per-frame/per-stream bits).  frames_*: (T, B, H, W, C)."""
    mesh = mesh or make_mesh()
    b = frames_bl.shape[1] if hasattr(frames_bl, "shape") else len(frames_bl[0])
    assert b == mesh.devices.size, (
        f"serve_streams: {b} streams on a {mesh.devices.size}-device mesh — "
        "per-stream bits require exactly one stream per device (the shard "
        "body sums bits over its whole local batch)")
    step = make_serving_step(mesh, shape_hr, scale_factor, pad_size)
    dpb = dpb0
    all_bits = []
    for t in range(frames_bl.shape[0]):
        dpb, bits = step(params, frames_bl[t], frames_el[t], dpb)
        all_bits.append(bits)
    return dpb, jnp.stack(all_bits)
