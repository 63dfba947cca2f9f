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
    """Resize NHWC `x` to (out_h, out_w), torch bilinear align_corners=False."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = x.shape[1], x.shape[2]
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_bilinear_matrix(h, out_h))
    mw = jnp.asarray(_bilinear_matrix(w, out_w))
    y = jnp.einsum("oh,nhwc->nowc", mh, x, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision=jax.lax.Precision.HIGHEST)
    return y


def bilinear_upsample2(x):
    """2x bilinear upsample (reference `bilinearupsacling`)."""
    return bilinear_resize(x, (x.shape[1] * 2, x.shape[2] * 2))


def bilinear_downsample2(x):
    """0.5x bilinear downsample (reference `bilineardownsacling`)."""
    return bilinear_resize(x, (x.shape[1] // 2, x.shape[2] // 2))
