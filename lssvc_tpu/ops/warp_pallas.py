"""Pallas TPU backward-warp kernel (bounded-displacement fast path).

XLA lowers arbitrary gathers to ~17ns/element scalar-unit loops — a single
1080p 48-channel bilinear warp costs ~0.5 s and OffsetDiversity's grouped
warp ~14 s (measured, tools/gather_bench.py).  This kernel instead slides a
per-output-tile source window through VMEM and resolves the bilinear taps
with vectorized within-vreg lane gathers:

  for each output tile (8 rows x 128 cols):
    DMA the (WIN_R x WIN_C) source window around the tile into VMEM
    for each window row s:                       # static unroll
      broadcast row s; per 128-col chunk, lane-gather at lx0/lx1
      accumulate (row-match masks x bilinear weights)

Exact whenever |dy| <= D_V and |dx| <= D_H for every pixel; callers wrap it
in `flow_warp_auto`, which checks the actual flow bounds at runtime and
falls back to the exact XLA gather path via lax.cond otherwise.

Layout: planar (C, H, W) inside the kernel (W in lanes); NHWC at the API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import flow_warp as _flow_warp_xla

TILE_R = 8
TILE_C = 128


def _warp_kernel(fx_ref, fy_ref, x_ref, out_ref, win_ref, sem,
                 *, d_v, d_h, h, w, n_chan):
    """Grid: (H/TILE_R, W/TILE_C). x_ref: padded planar (C, H+2p_v, W+2p_h)
    in HBM; fx/fy: (TILE_R, TILE_C) VMEM blocks; out: (C, TILE_R, TILE_C)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = TILE_R + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2

    # source window top-left in padded coords: tile origin minus (d_v+1)
    # (padded array has origin shifted by +d_v+1, so offset = tile origin)
    row0 = ti * TILE_R
    col0 = tj * TILE_C

    copy = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(row0, win_r), pl.ds(col0, win_c)],
        win_ref, sem)
    copy.start()

    # global sample positions (clamped to the true image); tpu.iota must be
    # integer-typed
    iy = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
          + ti * TILE_R).astype(jnp.float32)
    ix = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
          + tj * TILE_C).astype(jnp.float32)
    px = jnp.clip(ix + fx_ref[:], 0.0, w - 1.0)
    py = jnp.clip(iy + fy_ref[:], 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    # local (window) coords; the pad guarantees these are in range whenever
    # |flow| <= (d_v, d_h)
    lx0 = x0.astype(jnp.int32) - (tj * TILE_C - d_h - 1)
    ly0 = y0.astype(jnp.int32) - (ti * TILE_R - d_v - 1)
    lx0 = jnp.clip(lx0, 0, win_c - 2)
    ly0 = jnp.clip(ly0, 0, win_r - 2)

    n_cu = win_c // TILE_C  # window col chunks (win_c is a multiple of 128)
    n_rv = win_r // TILE_R  # window row chunks

    one = jnp.float32(1.0)
    # per-chunk lane indices, chunk-hit masks, and horizontal weights
    # (shared across channels and window rows)
    hsel = []
    for cu in range(n_cu):
        l0 = lx0 - cu * TILE_C
        l1 = l0 + 1
        w0 = jnp.where((l0 >= 0) & (l0 < TILE_C), one - wx, 0.0)
        w1 = jnp.where((l1 >= 0) & (l1 < TILE_C), wx, 0.0)
        hsel.append((jnp.clip(l0, 0, TILE_C - 1),
                     jnp.clip(l1, 0, TILE_C - 1), w0, w1))

    # vertical weights per window row (shared across channels)
    vw = []
    for s in range(win_r):
        row_is_y0 = (ly0 == s).astype(jnp.float32)
        row_is_y1 = (ly0 + 1 == s).astype(jnp.float32)
        vw.append(row_is_y0 * (one - wy) + row_is_y1 * wy)

    copy.wait()

    for c in range(n_chan):
        acc = jnp.zeros((TILE_R, TILE_C), jnp.float32)
        for rv in range(n_rv):
            for cu in range(n_cu):
                seg = win_ref[c, rv * TILE_R:(rv + 1) * TILE_R,
                              cu * TILE_C:(cu + 1) * TILE_C]
                i0, i1, w0, w1 = hsel[cu]
                for s_loc in range(TILE_R):
                    s = rv * TILE_R + s_loc
                    # broadcast window row s across sublanes via a
                    # constant-index sublane gather (vector.broadcast of a
                    # dynamic row slice is unsupported in Mosaic)
                    cidx = jnp.full((TILE_R, TILE_C), s_loc, jnp.int32)
                    row8 = jnp.take_along_axis(seg, cidx, axis=0)
                    g0 = jnp.take_along_axis(row8, i0, axis=1)
                    g1 = jnp.take_along_axis(row8, i1, axis=1)
                    acc = acc + (g0 * w0 + g1 * w1) * vw[s]
        out_ref[c, :, :] = acc


def _grouped_warp_kernel(fx_ref, fy_ref, mask_ref, x_ref, out_ref, win_ref,
                         sem, *, d_v, d_h, h, w, group_num, offset_num, cg):
    """OffsetDiversity grouped warp: `go = group_num*offset_num` warp units,
    unit j warps feature group (j % group_num)'s `cg` channels by its own
    flow and multiplies its mask.

    Grid (H/8, W/128).  x_ref: padded planar source (C_src, H+, W+) in HBM;
    fx/fy/mask: planar (go, TILE_R, TILE_C) VMEM blocks; out block layout
    c' = k*go + j (matches models.lssvc_blocks block layout).
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    go = group_num * offset_num
    win_r = TILE_R + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cu = win_c // TILE_C
    n_rv = win_r // TILE_R

    copy = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(ti * TILE_R, win_r), pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()

    iy = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0)
          + ti * TILE_R).astype(jnp.float32)
    ix = (jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1)
          + tj * TILE_C).astype(jnp.float32)
    one = jnp.float32(1.0)

    copy.wait()

    def unit_body(j, _):
        px = jnp.clip(ix + fx_ref[j, :, :], 0.0, w - 1.0)
        py = jnp.clip(iy + fy_ref[j, :, :], 0.0, h - 1.0)
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = px - x0
        wy = py - y0
        lx0 = jnp.clip(x0.astype(jnp.int32) - (tj * TILE_C - d_h - 1),
                       0, win_c - 2)
        ly0 = jnp.clip(y0.astype(jnp.int32) - (ti * TILE_R - d_v - 1),
                       0, win_r - 2)
        mask = mask_ref[j, :, :]

        hsel = []
        for cu in range(n_cu):
            l0 = lx0 - cu * TILE_C
            l1 = l0 + 1
            w0 = jnp.where((l0 >= 0) & (l0 < TILE_C), one - wx, 0.0)
            w1 = jnp.where((l1 >= 0) & (l1 < TILE_C), wx, 0.0)
            hsel.append((jnp.clip(l0, 0, TILE_C - 1),
                         jnp.clip(l1, 0, TILE_C - 1), w0, w1))

        g_feat = j % group_num

        def rv_body(rv, accs):
            vws = []
            for s_loc in range(TILE_R):
                s = rv * TILE_R + s_loc
                vws.append((ly0 == s).astype(jnp.float32) * (one - wy)
                           + (ly0 + 1 == s).astype(jnp.float32) * wy)
            new_accs = list(accs)
            for t in range(cg):
                for cu in range(n_cu):
                    i0, i1, w0, w1 = hsel[cu]
                    seg = win_ref[g_feat * cg + t,
                                  pl.ds(rv * TILE_R, TILE_R),
                                  cu * TILE_C:(cu + 1) * TILE_C]
                    for s_loc in range(TILE_R):
                        cidx = jnp.full((TILE_R, TILE_C), s_loc, jnp.int32)
                        row8 = jnp.take_along_axis(seg, cidx, axis=0)
                        g0 = jnp.take_along_axis(row8, i0, axis=1)
                        g1 = jnp.take_along_axis(row8, i1, axis=1)
                        new_accs[t] = new_accs[t] + \
                            (g0 * w0 + g1 * w1) * vws[s_loc]
            return tuple(new_accs)

        accs = jax.lax.fori_loop(
            0, n_rv, rv_body,
            tuple(jnp.zeros((TILE_R, TILE_C), jnp.float32)
                  for _ in range(cg)))
        for t in range(cg):
            out_ref[t * go + j, :, :] = accs[t] * mask
        return 0

    jax.lax.fori_loop(0, go, unit_body, 0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _grouped_warp_pallas(x, flow_x, flow_y, mask, d_v, d_h, group_num):
    """x: (1, H, W, C_src); flow_x/flow_y/mask: (1, H, W, go).
    Returns (1, H, W, go * cg) in block channel layout c' = k*go + j."""
    _, h, w, c_src = x.shape
    go = flow_x.shape[-1]
    offset_num = go // group_num
    cg = c_src // group_num
    win_r = TILE_R + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0 and win_r % TILE_R == 0

    planar = jnp.transpose(x[0], (2, 0, 1))
    padded = jnp.pad(planar, ((0, 0), (d_v + 1, d_v + 1 + TILE_R),
                              (d_h + 1, d_h + 1 + TILE_C)))
    fxp = jnp.transpose(flow_x[0], (2, 0, 1))
    fyp = jnp.transpose(flow_y[0], (2, 0, 1))
    mp = jnp.transpose(mask[0], (2, 0, 1))

    grid = (h // TILE_R, w // TILE_C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_grouped_warp_kernel, d_v=d_v, d_h=d_h, h=h, w=w,
                          group_num=group_num, offset_num=offset_num, cg=cg),
        out_shape=jax.ShapeDtypeStruct((go * cg, h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((go, TILE_R, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((go, TILE_R, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((go, TILE_R, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((go * cg, TILE_R, TILE_C),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_src, win_r, win_c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fxp, fyp, mp, padded)
    return jnp.transpose(out, (1, 2, 0))[None]


def _pad_to(v, m):
    return (v + m - 1) // m * m


@functools.partial(jax.jit, static_argnums=(3, 4))
def _flow_warp_pallas(x, flow_x, flow_y, d_v, d_h):
    """x: (1, H, W, C); flow_x/flow_y: (1, H, W). Requires H % 8 == 0,
    W % 128 == 0 (model tensors satisfy this at padded resolutions)."""
    _, h, w, c = x.shape
    win_r = TILE_R + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0, "2*d_h+2 must be a multiple of 128"

    planar = jnp.transpose(x[0], (2, 0, 1))  # (C, H, W)
    padded = jnp.pad(planar, ((0, 0), (d_v + 1, d_v + 1 + TILE_R),
                              (d_h + 1, d_h + 1 + TILE_C)))

    grid = (h // TILE_R, w // TILE_C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_warp_kernel, d_v=d_v, d_h=d_h, h=h, w=w, n_chan=c),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # padded source stays in HBM
        ],
        out_specs=pl.BlockSpec((c, TILE_R, TILE_C), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, win_r, win_c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flow_x[0], flow_y[0], padded)
    return jnp.transpose(out, (1, 2, 0))[None]


def flow_warp_auto(x, flow, d_v: int = 27, d_h: int = 63):
    """Bilinear backward warp: pallas windowed kernel when the flow is within
    (d_v, d_h) bounds, exact XLA gather fallback otherwise (lax.cond).

    Arbitrary H/W are padded up to the (8, 128) tile grid for the kernel and
    cropped back (padded pixels warp with zero flow and are discarded)."""
    _, h, w, _ = x.shape
    fx = flow[..., 0]
    fy = flow[..., 1]
    in_bounds = (jnp.max(jnp.abs(fx)) <= d_h - 1) & \
        (jnp.max(jnp.abs(fy)) <= d_v - 1)

    hp = _pad_to(h, TILE_R)
    wp = _pad_to(w, TILE_C)

    def fast(operands):
        x_, fx_, fy_ = operands[0], operands[1], operands[2]
        if (hp, wp) != (h, w):
            pad = ((0, 0), (0, hp - h), (0, wp - w))
            x_ = jnp.pad(x_, pad + ((0, 0),))
            fx_ = jnp.pad(fx_, pad)
            fy_ = jnp.pad(fy_, pad)
        out = _flow_warp_pallas(x_, fx_, fy_, d_v, d_h)
        return out[:, :h, :w, :]

    return jax.lax.cond(
        in_bounds,
        fast,
        lambda operands: _flow_warp_xla(operands[0], operands[3]),
        (x, fx, fy, flow))


def grouped_warp_auto(x, flow_x, flow_y, mask, group_num: int,
                      d_v: int = 43, d_h: int = 63):
    """OffsetDiversity grouped warp with mask, block-layout output
    (c' = k*go + j): pallas fast path when every unit's offsets are within
    (d_v, d_h), XLA grouped-gather fallback otherwise."""
    from .warp import flow_warp_grouped

    _, h, w, c_src = x.shape
    cg = c_src // group_num
    in_bounds = (jnp.max(jnp.abs(flow_x)) <= d_h - 1) & \
        (jnp.max(jnp.abs(flow_y)) <= d_v - 1)

    hp = _pad_to(h, TILE_R)
    wp = _pad_to(w, TILE_C)

    def fast(operands):
        x_, fx_, fy_, m_ = operands
        if (hp, wp) != (h, w):
            pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
            x_ = jnp.pad(x_, pad)
            fx_ = jnp.pad(fx_, pad)
            fy_ = jnp.pad(fy_, pad)
            m_ = jnp.pad(m_, pad)
        out = _grouped_warp_pallas(x_, fx_, fy_, m_, d_v, d_h, group_num)
        return out[:, :h, :w, :]

    def slow(operands):
        x_, fx_, fy_, m_ = operands
        planes = [x_[..., k::cg] for k in range(cg)]
        x_blk = jnp.concatenate([pl for plane in planes
                                 for pl in (plane, plane)], axis=-1)
        warped = flow_warp_grouped(x_blk, fx_, fy_)
        return warped * jnp.concatenate([m_] * cg, axis=-1)

    return jax.lax.cond(in_bounds, fast, slow, (x, flow_x, flow_y, mask))
