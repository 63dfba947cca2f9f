"""Spatial (height-axis) partitioning of a SINGLE stream over a device mesh.

Data parallelism (`parallel/serve.py`) scales aggregate throughput with
independent streams, but a single stream's latency is bound to one chip.
This module shards one frame's height dimension across the mesh so every
stage of the two-layer forward — full-res context stacks, SpyNet pyramid,
AEs, the four-part prior at 1/16 res — runs on H/n rows per chip:

- Convolutions / transposed convolutions: XLA's SPMD partitioner inserts
  the boundary halo exchanges (collective-permute over ICI) automatically
  from the sharding annotations; nothing model-side changes.
- Dense resize matmuls (`utils/resize.py`, `ops/warp.py:bilinear_resize`):
  partition as ordinary matmuls over the H contraction.
- Bit estimation: global sums; GSPMD inserts the all-reduce.
- Backward warps: bounded-displacement gathers.  On the automatic path
  GSPMD partitions the gather formulation.  For the Pallas warp kernels
  (which GSPMD cannot partition) `flow_warp_spatial` provides the explicit
  shard_map halo-exchange wrapper: each shard ppermutes `halo` boundary
  rows from its mesh neighbours, edge shards clamp-replicate their own
  border rows (matching the global border-clamp semantics of
  `ops/warp.py:flow_warp`), and the per-shard warp runs on the padded
  strip with a row offset.

Reference counterpart: none — the reference's only parallelism is a
sequence-level process pool (`/root/reference/test.py:685-748`).  This is
the TPU-native single-stream scaling axis (mesh + pjit + ICI collectives).

Validated on the virtual CPU mesh (`tests/test_spatial.py`): the sharded
forward matches the unsharded one and the halo warp matches the global
warp bit-for-bit in fp32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

try:  # jax >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def h_sharding(mesh: Mesh, axis: str = "h") -> NamedSharding:
    """NHWC array sharded along its height dim."""
    return NamedSharding(mesh, PS(None, axis, None, None))


def make_spatial_mesh(n_devices: int | None = None, axis: str = "h") -> Mesh:
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_spatial_forward(mesh: Mesh, shape_hr, scale_factor: float = 2.0,
                         pad_size=(0, 0, 0, 0), axis: str = "h",
                         kernel_warps: bool = False, halo: int = 8,
                         halo_grouped: int = 44):
    """Jit the two-layer P-frame forward with every image-like input and
    DPB output sharded along H over `mesh`.

    Returns fn(params, x_bl, x_el, dpb) -> (dpb, bit_bl + bit_el) with
    `dpb` the usual four-entry dict.  Parameters are replicated; frames
    and features live H-sharded on device between frames (the DPB feeds
    back without resharding).

    kernel_warps=True routes every warp through the shard_map
    halo-exchange wrappers (`ops/spatial_ctx.py`), so on TPU each shard
    runs the Pallas warp kernels on its own strip — required for the
    spatial mode to be fast on real hardware (GSPMD partitions the
    gather formulation into scalar loops).  Exact whenever |flow_y| stays
    within `halo` (single-flow warps) / `halo_grouped` (OffsetDiversity).
    """
    from ..models import lssvc as lssvc_model
    from ..ops import spatial_ctx

    h_sh = h_sharding(mesh, axis)
    repl = NamedSharding(mesh, PS())

    def fwd(params, x_bl, x_el, dpb):
        import contextlib

        ctx = (spatial_ctx.spatial(mesh, axis, halo, halo_grouped)
               if kernel_warps else contextlib.nullcontext())
        with ctx:
            out = lssvc_model.forward_one_frame(
                params, x_bl, x_el, dpb["ref_frame_bl"], dpb["ref_frame_el"],
                dpb["ref_feature_bl"], dpb["ref_feature_el"],
                shape_hr, scale_factor, pad_size)
        return out["dpb"], out["bit_bl"] + out["bit_el"]

    dpb_sh = {k: h_sh for k in ("ref_frame_bl", "ref_frame_el",
                                "ref_feature_bl", "ref_feature_el")}
    return jax.jit(fwd,
                   in_shardings=(repl, h_sh, h_sh, dpb_sh),
                   out_shardings=(dpb_sh, repl))


def make_spatial_intra_forward(mesh: Mesh, shape_hr, pad_size=(0, 0, 0, 0),
                               axis: str = "h"):
    """H-sharded IntraSS two-layer I-frame forward.

    The intra path is warp-free (convs, GDN, resizes, bit sums), so GSPMD
    partitions everything from the jit sharding annotations alone.
    Returns fn(params, x_bl, x_el) -> (x_hat_el H-sharded, bit_bl+bit_el).
    Serving a GOP spatially = this for I-frames + `make_spatial_forward`
    for P-frames (the DPB stays H-sharded across both).
    """
    from ..models import intra_ss

    h_sh = h_sharding(mesh, axis)
    repl = NamedSharding(mesh, PS())

    def fwd(params, x_bl, x_el):
        out = intra_ss.forward(params, x_bl, x_el, shape_hr, pad_size)
        return out["x_hat_el"], out["bit_bl"] + out["bit_el"]

    return jax.jit(fwd, in_shardings=(repl, h_sh, h_sh),
                   out_shardings=(h_sh, repl))


# --- explicit halo-exchange warp (shard_map) --------------------------------


def _pad_rows_from_neighbours(x_local, halo: int, axis: str):
    """Per-shard (inside shard_map): return x with `halo` rows of context
    above and below.  Interior boundaries come from the mesh neighbours via
    ppermute; the global top/bottom edges clamp-replicate the shard's own
    border row (identical to the global warp's border-clamp sampling).

    x_local: (N, h_local, W, C) shard view; requires h_local >= halo.
    """
    n_shards = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    # rows this shard sends down to the next shard / up to the previous one
    bottom_rows = x_local[:, -halo:]  # -> becomes next shard's top halo
    top_rows = x_local[:, :halo]      # -> becomes previous shard's bottom halo

    perm_down = [(i, i + 1) for i in range(n_shards - 1)]
    perm_up = [(i + 1, i) for i in range(n_shards - 1)]
    from_above = jax.lax.ppermute(bottom_rows, axis, perm_down)
    from_below = jax.lax.ppermute(top_rows, axis, perm_up)

    # edge shards: replicate own border row (global clamp semantics)
    clamp_top = jnp.repeat(x_local[:, :1], halo, axis=1)
    clamp_bot = jnp.repeat(x_local[:, -1:], halo, axis=1)
    top = jnp.where(idx == 0, clamp_top, from_above)
    bot = jnp.where(idx == n_shards - 1, clamp_bot, from_below)
    return jnp.concatenate([top, x_local, bot], axis=1)


def _padded_strip(x_local, halo: int, axis: str):
    """Per-shard strip with `halo` rows of context on each side.

    halo < h_local: single ppermute exchange with the immediate
    neighbours (`_pad_rows_from_neighbours`).  halo >= h_local (deep
    halos on small shards, e.g. OffsetDiversity's 40-px offsets on a
    short test frame): all-gather the rows, edge-pad the full image, and
    slice this shard's strip — more bytes, still exact.
    """
    h_local = x_local.shape[1]
    if halo < h_local:
        return _pad_rows_from_neighbours(x_local, halo, axis)
    full = jax.lax.all_gather(x_local, axis, axis=1, tiled=True)
    full = jnp.concatenate(
        [jnp.repeat(full[:, :1], halo, axis=1), full,
         jnp.repeat(full[:, -1:], halo, axis=1)], axis=1)
    row0 = jax.lax.axis_index(axis) * h_local  # strip start in padded rows
    return jax.lax.dynamic_slice_in_dim(full, row0, h_local + 2 * halo,
                                        axis=1)


def _row_indexed_warp(x_pad, flow, halo: int, row0, h_total: int):
    """Bilinear backward warp of the local output rows against the padded
    strip.  Sampling clamps against the STRIP bounds; because the strip
    carries `halo` rows of true context (or clamp-replicated edge rows)
    and |flow_y| <= halo, this equals the global warp's clamp against the
    full image (`ops/warp.py:flow_warp` semantics: align_corners grid,
    border padding).

    x_pad: (N, h_local + 2*halo, W, C); flow: (N, h_local, W, 2) local
    view; row0: this shard's first global row (traced scalar).
    """
    del row0, h_total  # strip-local clamping is exact given the halo
    n, hl, w, _ = flow.shape
    hp = x_pad.shape[1]
    fx, fy = flow[..., 0], flow[..., 1]
    yy = jnp.arange(hl, dtype=flow.dtype)[None, :, None] + fy + halo
    xx = jnp.arange(w, dtype=flow.dtype)[None, None, :] + fx
    y0 = jnp.clip(jnp.floor(yy), 0, hp - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, hp - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(yy, 0, hp - 1) - y0.astype(flow.dtype)
    wx = jnp.clip(xx, 0, w - 1) - x0.astype(flow.dtype)

    def gather(yi, xi):
        flat = x_pad.reshape(n, hp * w, -1)
        lin = (yi * w + xi).reshape(n, hl * w)
        return jnp.take_along_axis(flat, lin[..., None], axis=1
                                   ).reshape(n, hl, w, -1)

    out = ((1 - wy)[..., None] * ((1 - wx)[..., None] * gather(y0, x0)
                                  + wx[..., None] * gather(y0, x1))
           + wy[..., None] * ((1 - wx)[..., None] * gather(y1, x0)
                              + wx[..., None] * gather(y1, x1)))
    return out


def flow_warp_spatial(x, flow, mesh: Mesh, halo: int, axis: str = "h"):
    """Backward warp of an H-sharded tensor by an H-sharded flow without
    gathering the full frame to any chip.

    Exact vs the global `ops/warp.py:flow_warp` whenever every
    |flow_y| <= halo (codec flows are a few pixels; the Pallas tiers
    already key off the same bound).  |flow_x| is unrestricted — W is
    unsharded.  Each shard exchanges `halo` boundary rows with its mesh
    neighbours (ppermute over ICI), then warps its own rows against the
    padded strip.  On TPU deployments the per-shard warp body is the
    place to call the Pallas kernels; the portable gather body used here
    is what non-TPU backends run anyway.
    """
    h_total = x.shape[1]
    _check_shard_height(h_total, mesh, halo, axis)

    def local(x_l, flow_l):
        x_pad = _pad_rows_from_neighbours(x_l, halo, axis)
        row0 = jax.lax.axis_index(axis) * x_l.shape[1]
        return _row_indexed_warp(x_pad, flow_l, halo, row0, h_total)

    spec = PS(None, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec)(x, flow)


def _check_shard_height(h_total, mesh, halo, axis):
    """_pad_rows_from_neighbours exchanges rows with IMMEDIATE neighbours
    only; if a shard is shorter than the halo, the padded strip silently
    holds wrong rows (the *_auto variants route through _padded_strip,
    which multi-hops — these direct wrappers must refuse instead)."""
    n = mesh.shape[axis]
    if h_total // n < halo:
        raise ValueError(
            f"per-shard height {h_total}//{n}={h_total // n} < halo {halo}: "
            f"single-hop neighbour exchange cannot supply the halo; use the "
            f"*_sharded_auto/_auto variants (multi-hop strip) or fewer shards")


def _shard_map_norep(local, mesh, in_specs, out_specs):
    """shard_map with the static varying-axes check off (fori_loop carries
    created inside warp bodies are unvarying until updated, which the
    checker rejects despite correctness)."""
    try:
        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def flow_warp_sharded_auto(x, flow, mesh: Mesh, halo: int, axis: str = "h",
                           fmax=None):
    """H-sharded warp that runs the normal tiered dispatch PER SHARD —
    on TPU each shard executes the Pallas kernels on its neighbour-padded
    strip (the GSPMD-partitioned gather alternative lowers to scalar
    loops).

    Correct for ANY flow: when the measured global max |flow_y| exceeds
    `halo` (checked at runtime; a caller-provided `fmax` bound is used
    instead when given), a lax.cond falls back to an exact branch that
    all-gathers the frame and warps this shard's rows against it with the
    low-memory sequential-tap formulation (lax.cond reserves HBM for both
    branches, so the rare branch must stay small — docs/PERFORMANCE.md
    §batch-of-sequences)."""
    from ..ops import spatial_ctx, warp_pallas
    from ..ops.warp import flow_warp_lowmem

    pad = ((0, 0), (halo, halo), (0, 0), (0, 0))
    spec = PS(None, axis, None, None)
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    def _strip(ops, fmax_s=None):
        x_l, flow_l = ops
        x_pad = _padded_strip(x_l, halo, axis)
        flow_pad = jnp.pad(flow_l, pad, mode="edge")
        with spatial_ctx.cleared():
            if fmax_s is None:
                out = warp_pallas.flow_warp_auto(x_pad, flow_pad)
            else:
                out = warp_pallas.flow_warp_auto(x_pad, flow_pad,
                                                 fmax=fmax_s)
        return out[:, halo:-halo].astype(dt)

    def _exact(ops):
        # all-gather + low-memory global warp of this shard's rows
        x_l, flow_l = ops
        hl = x_l.shape[1]
        full = jax.lax.all_gather(x_l, axis, axis=1, tiled=True)
        full_f = jax.lax.all_gather(flow_l, axis, axis=1, tiled=True)
        out_full = flow_warp_lowmem(full.astype(jnp.float32), full_f)
        row0 = jax.lax.axis_index(axis) * hl
        return jax.lax.dynamic_slice_in_dim(out_full, row0, hl,
                                            axis=1).astype(dt)

    if fmax is None:
        def local_nomax(x_l, flow_l):
            fy_max = jax.lax.pmax(jnp.max(jnp.abs(flow_l[..., 1])), axis)
            return jax.lax.cond(fy_max <= halo, _strip, _exact,
                                (x_l, flow_l))

        return _shard_map_norep(local_nomax, mesh, (spec, spec),
                                spec)(x, flow)

    def local_f(x_l, flow_l, fmax_s):
        return jax.lax.cond(
            fmax_s <= halo,
            lambda ops: _strip(ops, fmax_s), _exact, (x_l, flow_l))

    return _shard_map_norep(local_f, mesh, (spec, spec, PS()),
                            spec)(x, flow, jnp.asarray(fmax, jnp.float32))


def grouped_warp_sharded_auto(x, flow_x, flow_y, mask, group_num: int,
                              mesh: Mesh, halo: int, axis: str = "h"):
    """Grouped (OffsetDiversity) tiered warp per shard; see
    `flow_warp_sharded_auto`.  Runtime-guarded like the single-flow
    wrapper: |flow_y| beyond `halo` takes an exact all-gather +
    low-memory grouped warp branch instead of silently clamping."""
    from ..ops import spatial_ctx, warp_pallas
    from ..ops.warp import grouped_warp_lowmem

    pad = ((0, 0), (halo, halo), (0, 0), (0, 0))
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    def _strip(ops):
        x_l, fx_l, fy_l, m_l = ops
        x_pad = _padded_strip(x_l, halo, axis)
        fx_p = jnp.pad(fx_l, pad, mode="edge")
        fy_p = jnp.pad(fy_l, pad, mode="edge")
        m_p = jnp.pad(m_l, pad, mode="edge")
        with spatial_ctx.cleared():
            out = warp_pallas.grouped_warp_auto(x_pad, fx_p, fy_p, m_p,
                                                group_num)
        return out[:, halo:-halo].astype(dt)

    def _exact(ops):
        x_l, fx_l, fy_l, m_l = ops
        hl = x_l.shape[1]
        ga = lambda t: jax.lax.all_gather(t, axis, axis=1, tiled=True)
        out_full = grouped_warp_lowmem(ga(x_l).astype(jnp.float32),
                                       ga(fx_l), ga(fy_l), ga(m_l),
                                       group_num)
        row0 = jax.lax.axis_index(axis) * hl
        return jax.lax.dynamic_slice_in_dim(out_full, row0, hl,
                                            axis=1).astype(dt)

    def local(x_l, fx_l, fy_l, m_l):
        fy_max = jax.lax.pmax(jnp.max(jnp.abs(fy_l)), axis)
        return jax.lax.cond(fy_max <= halo, _strip, _exact,
                            (x_l, fx_l, fy_l, m_l))

    spec = PS(None, axis, None, None)
    return _shard_map_norep(local, mesh, (spec,) * 4,
                            spec)(x, flow_x, flow_y, mask)


def grouped_warp_spatial(x, flow_x, flow_y, mask, group_num: int,
                         mesh: Mesh, halo: int, axis: str = "h"):
    """OffsetDiversity's grouped warp (`ops/warp.py:grouped_warp_lowmem`
    semantics: block channel layout, per-unit flows and masks) on an
    H-sharded frame.

    Exact vs the global grouped warp whenever every |flow_y| <= halo.
    Reuses the global implementation per shard: the source strip is padded
    with `halo` neighbour rows (ppermute; edge shards clamp-replicate),
    the flow/mask planes are edge-padded to match, and the padded output
    rows are cropped — so center rows sample exactly as the global warp
    would, including its border clamp.
    """
    from ..ops.warp import grouped_warp_lowmem

    _check_shard_height(x.shape[1], mesh, halo, axis)

    def local(x_l, fx_l, fy_l, m_l):
        x_pad = _pad_rows_from_neighbours(x_l, halo, axis)
        pad = ((0, 0), (halo, halo), (0, 0), (0, 0))
        fx_p = jnp.pad(fx_l, pad, mode="edge")
        fy_p = jnp.pad(fy_l, pad, mode="edge")
        m_p = jnp.pad(m_l, pad, mode="edge")
        out = grouped_warp_lowmem(x_pad, fx_p, fy_p, m_p, group_num)
        return out[:, halo:-halo]

    spec = PS(None, axis, None, None)
    return _shard_map_norep(local, mesh, (spec,) * 4,
                            spec)(x, flow_x, flow_y, mask)
