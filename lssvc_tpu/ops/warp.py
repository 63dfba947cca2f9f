"""Backward warping and bilinear resizing.

`flow_warp` matches torch `grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)` driven by a pixel-displacement
flow field, the semantics the reference builds out of a cached normalized
grid (`/root/reference/src/InterModules/video_net_component.py:329-352`).
With align_corners=True and a grid of base+flow/((S-1)/2), the sample
position in pixel space is simply index + flow — so we skip the
normalize/denormalize round-trip entirely and gather directly.

`bilinear_resize` matches torch `interpolate(mode='bilinear',
align_corners=False)`.  Because shapes are static under jit, it is expressed
as two cached dense matrices (one per axis) applied as matmuls — MXU work
instead of gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def clamp_flow(flow, h, w):
    """Clamp a pixel-space flow field (..., 2: (dx, dy)) to +-(W, H).

    Bit-exact under the border-clamping warp semantics above
    (`video_net_component.py:329-347`): the sample position is
    clip(index + flow, 0, S-1), and for any index in [0, S-1] a flow
    component beyond +-S lands outside [0, S-1] on the same side as one
    clamped at +-S, so the clipped position — and the warp output — is
    identical.  Non-finite components (a partially trained or corrupted
    model can emit them) map to the same saturated bounds (NaN -> 0).

    Serving calls this on every decoded/estimated motion field before
    warp-tier dispatch so the |flow| max-reductions that pick the warp
    tier stay finite and bounded by the frame size regardless of model
    health (the round-4 trained checkpoint emitted ~3e11 px flows, which
    parked every warp in the gather fallback tier).
    """
    bound = jnp.asarray([w, h], jnp.float32).astype(flow.dtype)
    return jnp.clip(jnp.nan_to_num(flow, nan=0.0, posinf=float(max(h, w)),
                                   neginf=-float(max(h, w))),
                    -bound, bound)


def flow_warp(x, flow):
    """Backward-warp NHWC `x` by pixel-space `flow` (N, H, W, 2: (dx, dy)).

    Bilinear, border clamping, align_corners=True semantics.

    Implemented as four whole-row gathers (jnp.take over flattened pixels,
    batch folded into rows) — the formulation XLA:TPU lowers to vectorized
    row DMAs rather than per-element gathers.
    """
    n, h, w, c = x.shape
    iy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    ix = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    px = jnp.clip(ix + flow[..., 0], 0.0, w - 1.0)
    py = jnp.clip(iy + flow[..., 1], 0.0, h - 1.0)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flat = x.reshape(n * h * w, c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]

    def gather(yy, xx):
        idx = (base + yy * w + xx).reshape(-1)  # (N*H*W,) row ids
        return jnp.take(flat, idx, axis=0,
                        indices_are_sorted=False,
                        unique_indices=False).reshape(n, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def flow_warp_lowmem(x, flow):
    """`flow_warp` in planar (W-minor) layout with the four bilinear taps
    gathered sequentially — accumulator + ONE live tap.

    Exists for the lax.cond fallback branches in `warp_pallas`: XLA reserves
    HBM for BOTH branches of a cond, so the (rarely-taken) gather fallback's
    temps count against peak memory even when the pallas kernel runs — at
    batch-2 1080p the eager formulation's reserved temps alone are >10 GB.
    Two tricks keep this branch small: (a) everything spatial lives in
    (..., H, W) planar shapes, whose (8,128) tiling pads ~1x, instead of
    channel-minor (H, W, C) shapes that pad 4-40x for small C; (b) per-tap
    coordinates are selected with lax.switch over the already-materialized
    corner planes, so no (4, ...) stack is materialized.  Tap accumulation
    order differs from `flow_warp`'s factored lerp — agrees to ~1e-6, not
    bit-exactly."""
    n, h, w, c = x.shape
    iy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    ix = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    px = jnp.clip(ix + flow[..., 0], 0.0, w - 1.0)
    py = jnp.clip(iy + flow[..., 1], 0.0, h - 1.0)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    xp = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)

    def tap(t, acc):
        yy = jax.lax.switch(t, [lambda: y0, lambda: y0,
                                lambda: y1, lambda: y1])
        xx = jax.lax.switch(t, [lambda: x0, lambda: x1,
                                lambda: x0, lambda: x1])
        wt = jax.lax.switch(t, [lambda: (1.0 - wx) * (1.0 - wy),
                                lambda: wx * (1.0 - wy),
                                lambda: (1.0 - wx) * wy,
                                lambda: wx * wy])
        idx = (yy * w + xx).reshape(n, 1, h * w)
        v = jnp.take_along_axis(xp, idx, axis=2)
        return acc + v * wt.reshape(n, 1, h * w)

    out = jax.lax.fori_loop(0, 4, tap, jnp.zeros_like(xp))
    return jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))


def flow_warp_grouped(x, flow_x, flow_y):
    """Backward-warp with per-channel-group flows, block channel layout.

    x: (B, H, W, C); flow_x/flow_y: (B, H, W, G) with C % G == 0 — channel
    c = k*G + g (k in [0, C/G)) is warped by flow group g.  Same bilinear /
    border / align-corners semantics as flow_warp.

    The block layout matters on TPU: per-group expansion is then a channel
    concat (layout-preserving) rather than an interleaving repeat, which XLA
    lowers through rank-5 intermediates whose tiny minor dims get padded to
    the (8, 128) tile — 20-40x memory blowup at 1080p.
    """
    b, h, w, c = x.shape
    g = flow_x.shape[-1]
    r = c // g
    iy = jnp.arange(h, dtype=flow_x.dtype)[None, :, None, None]
    ix = jnp.arange(w, dtype=flow_x.dtype)[None, None, :, None]
    px = jnp.clip(ix + flow_x, 0.0, w - 1.0)
    py = jnp.clip(iy + flow_y, 0.0, h - 1.0)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flat = x.reshape(b, h * w, c)

    def expand(t):
        # (B, H, W, G) -> (B, H, W, C) in block layout: channel k*G+g <- g
        return t if r == 1 else jnp.concatenate([t] * r, axis=-1)

    def gather(yy, xx):
        idx = expand(yy * w + xx).reshape(b, h * w, c)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    wxc = expand(wx)
    wyc = expand(wy)
    top = v00 * (1.0 - wxc) + v01 * wxc
    bot = v10 * (1.0 - wxc) + v11 * wxc
    return top * (1.0 - wyc) + bot * wyc


def grouped_warp_lowmem(x, flow_x, flow_y, mask, group_num: int):
    """OffsetDiversity grouped warp, low-peak-memory formulation for the
    lax.cond fallback branch (see `flow_warp_lowmem`): a fori_loop over the
    go flow units, everything in planar (W-minor) layout.  Never
    materializes the (B, H, W, go*cg) expanded source or any per-tap index
    stack — per-iteration temps are (B, cg, H*W).

    Semantics identical to the eager block path
    (`warp_pallas._slow_impl` with `flow_warp_grouped`): output channel
    c' = k*go + j is source channel (j % group_num)*cg + k warped by flow
    unit j, times mask j; same factored bilinear lerp, border clamp,
    align_corners=True."""
    b, h, w, c_src = x.shape
    go = flow_x.shape[-1]
    g = group_num
    cg = c_src // g
    hw = h * w
    xp = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c_src, hw)
    fxp = jnp.transpose(flow_x, (0, 3, 1, 2))  # (b, go, h, w)
    fyp = jnp.transpose(flow_y, (0, 3, 1, 2))
    mp = jnp.transpose(mask, (0, 3, 1, 2)).reshape(b, go, hw)
    iy = jnp.arange(h, dtype=flow_x.dtype)[None, :, None]
    ix = jnp.arange(w, dtype=flow_x.dtype)[None, None, :]

    def unit(j, out):
        px = jnp.clip(ix + fxp[:, j], 0.0, w - 1.0)
        py = jnp.clip(iy + fyp[:, j], 0.0, h - 1.0)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = (px - x0).reshape(b, 1, hw)
        wy = (py - y0).reshape(b, 1, hw)
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        src = jax.lax.dynamic_slice_in_dim(xp, (j % g) * cg, cg, axis=1)

        def gat(yy, xx):
            idx = (yy * w + xx).reshape(b, 1, hw)
            return jnp.take_along_axis(src, idx, axis=2)

        top = gat(y0, x0) * (1.0 - wx) + gat(y0, x1) * wx
        bot = gat(y1, x0) * (1.0 - wx) + gat(y1, x1) * wx
        v = (top * (1.0 - wy) + bot * wy) * mp[:, j][:, None]
        return jax.lax.dynamic_update_index_in_dim(out, v, j, 2)

    out = jax.lax.fori_loop(0, go, unit,
                            jnp.zeros((b, cg, go, hw), x.dtype))
    return jnp.transpose(out.reshape(b, cg * go, h, w), (0, 2, 3, 1))


@functools.lru_cache(maxsize=512)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix reproducing torch bilinear align_corners=False."""
    pos = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
    pos = np.maximum(pos, 0.0)
    x0 = np.floor(pos).astype(np.int64)
    w1 = (pos - x0).astype(np.float32)
    i0 = np.minimum(x0, in_size - 1)
    i1 = np.minimum(x0 + 1, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, i0), 1.0 - w1)
    np.add.at(mat, (rows, i1), w1)
    return mat


def bilinear_resize(x, out_hw):
    """Resize NHWC `x` to (out_h, out_w), torch bilinear align_corners=False.

    Exact 2x / 0.5x factors take the 2-tap lerp path (pure elementwise, no
    matmul); other factors run the 2-banded resize matrices as dense
    einsums (layout-friendly but FLOP-heavy — only hit by non-integer layer
    ratios such as x1.5)."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[1], x.shape[2]
    if (h, w) == (out_h, out_w):
        return x
    if (out_h, out_w) == (2 * h, 2 * w):
        return bilinear_upsample2(x)
    if (2 * out_h, 2 * out_w) == (h, w):
        return bilinear_downsample2(x)
    from .nn import compute_dtype, default_conv_precision

    prec = default_conv_precision()
    dt = compute_dtype()
    mh = jnp.asarray(_bilinear_matrix(h, out_h), dtype=dt)
    mw = jnp.asarray(_bilinear_matrix(w, out_w), dtype=dt)
    xc = x.astype(dt)
    y = jnp.einsum("oh,nhwc->nowc", mh, xc, precision=prec)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision=prec)
    return y.astype(x.dtype)


def _up2_axis(x, axis):
    """2x torch-bilinear (align_corners=False) along `axis`: sample position
    for output 2j is j - 0.25 and for 2j+1 is j + 0.25, border-clamped, so
    even outputs are 0.75*x[j] + 0.25*x[j-1] and odd 0.75*x[j] + 0.25*x[j+1].
    The interleave reshape merges two MAJOR dims — no tiny-minor-dim
    tile-padding (the TPU layout pathology documented in PERFORMANCE.md)."""
    n = x.shape[axis]
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    xm = jnp.concatenate([first, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)],
                         axis=axis)
    xp = jnp.concatenate([jax.lax.slice_in_dim(x, 1, n, axis=axis), last],
                         axis=axis)
    even = 0.75 * x + 0.25 * xm
    odd = 0.75 * x + 0.25 * xp
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = x.shape[:axis] + (2 * n,) + x.shape[axis + 1:]
    return stacked.reshape(new_shape)


def bilinear_upsample2(x):
    """2x bilinear upsample (reference `bilinearupsacling`), 2-tap lerps."""
    return _up2_axis(_up2_axis(x, 1), 2)


def bilinear_downsample2(x):
    """0.5x bilinear downsample (reference `bilineardownsacling`): sample
    position for output i is 2i + 0.5 -> mean of the two source rows/cols."""
    n, h, w, c = x.shape
    y = 0.5 * (x[:, 0::2] + x[:, 1::2])
    return 0.5 * (y[:, :, 0::2] + y[:, :, 1::2])

def flow_warp_shift_sum(x, flow, bound: int):
    """Exact bilinear backward warp for |flow| <= `bound` (both axes), as a
    sum over integer taps: out = sum_{dy,dx} shift(x, dy, dx) *
    relu(1-|fy_eff-dy|) * relu(1-|fx_eff-dx|).

    No gathers (XLA:TPU lowers dynamic gathers to ~17ns/element scalar
    loops) and no pallas: a fori_loop over the (2b+2)^2 taps, each taking a
    dynamic_slice of ONE zero-padded copy.  Structure notes (both measured
    at 1080p): a fully unrolled sum makes XLA materialize every shifted
    copy (36 GB, compile-time HBM OOM); hoisting the row slice per vertical
    tap with static horizontal unroll is ~2x faster in isolation but raises
    the full model's peak HBM past capacity.  The per-tap loop is the
    memory-safe shape.

    Border semantics match `flow_warp` (clamp): clamping the sample
    position keeps the effective per-pixel flow within [-bound, bound], and
    out-of-image taps always carry zero weight, so zero-fill shifts are
    exact.
    """
    n, h, w, c = x.shape
    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    fy = (jnp.clip(iy + flow[..., 1], 0.0, h - 1.0) - iy)[..., None]
    fx = (jnp.clip(ix + flow[..., 0], 0.0, w - 1.0) - ix)[..., None]

    taps = 2 * bound + 2
    xp = jnp.pad(x, ((0, 0), (bound, bound + 1), (bound, bound + 1), (0, 0)))

    one = jnp.float32(1.0)

    def tap_body(t, acc):
        dy = (t // taps - bound).astype(jnp.float32)
        dx = (t % taps - bound).astype(jnp.float32)
        wy = jnp.maximum(one - jnp.abs(fy - dy), 0.0)
        wx = jnp.maximum(one - jnp.abs(fx - dx), 0.0)
        xs = jax.lax.dynamic_slice(
            xp, (0, t // taps, t % taps, 0), (n, h, w, c))
        return acc + xs * (wy * wx)

    return jax.lax.fori_loop(0, taps * taps, tap_body, jnp.zeros_like(x))


def grouped_warp_shift_sum(x, flow_x, flow_y, mask, group_num: int,
                           bound: int):
    """Shift-sum variant of the OffsetDiversity grouped warp (block channel
    layout c' = k*go + j, mask applied), exact for |flow| <= bound.

    Per tap, ALL go=group_num*offset_num units share the same shifted
    source; only the per-unit weight maps differ.  Same memory-safe
    per-tap fori_loop as flow_warp_shift_sum, with one go-channel
    accumulator per k-block so the weights are never expanded to the full
    output width.
    """
    n, h, w, c_src = x.shape
    go = flow_x.shape[-1]
    offset_num = go // group_num
    cg = c_src // group_num

    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    fy = jnp.clip(iy + flow_y, 0.0, h - 1.0) - iy  # (N, H, W, go)
    fx = jnp.clip(ix + flow_x, 0.0, w - 1.0) - ix

    # block-layout source: channel c' = k*go + j holds feature group
    # (j % group_num)'s k-th channel
    planes = [x[..., k::cg] for k in range(cg)]  # (N, H, W, group_num) each
    x_blk = jnp.concatenate([p for plane in planes
                             for p in (plane,) * offset_num], axis=-1)
    c_out = x_blk.shape[-1]

    taps = 2 * bound + 2
    xp = jnp.pad(x_blk,
                 ((0, 0), (bound, bound + 1), (bound, bound + 1), (0, 0)))

    one = jnp.float32(1.0)

    def tap_body(t, accs):
        dy = (t // taps - bound).astype(jnp.float32)
        dx = (t % taps - bound).astype(jnp.float32)
        wy = jnp.maximum(one - jnp.abs(fy - dy), 0.0)
        wx = jnp.maximum(one - jnp.abs(fx - dx), 0.0)
        wgt = wy * wx
        xs = jax.lax.dynamic_slice(
            xp, (0, t // taps, t % taps, 0), (n, h, w, c_out))
        return tuple(
            accs[k] + jax.lax.slice_in_dim(xs, k * go, (k + 1) * go,
                                           axis=3) * wgt
            for k in range(cg))

    zero = jnp.zeros((n, h, w, go), x_blk.dtype)
    accs = jax.lax.fori_loop(0, taps * taps, tap_body, (zero,) * cg)
    return jnp.concatenate([a * mask for a in accs], axis=-1)
