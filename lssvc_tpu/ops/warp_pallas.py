"""Pallas TPU backward-warp kernel (bounded-displacement fast path).

XLA lowers arbitrary gathers to ~17ns/element scalar-unit loops — a single
1080p 48-channel bilinear warp costs ~0.5 s and OffsetDiversity's grouped
warp ~14 s (measured, tools/gather_bench.py).  This kernel instead slides a
per-output-tile source window through VMEM and resolves the bilinear taps
with vectorized within-vreg lane gathers:

  for each output tile (TR rows x 128 cols):
    DMA the (WIN_R x WIN_C) source window around the tile into VMEM
    for each window row s:
      broadcast row s; per 128-col chunk, lane-gather at lx0/lx1
      accumulate (row-match masks x bilinear weights)

TR is chosen by image height (8/32/64): taller tiles amortize the window
margin — HBM read overshoot drops from 16x at TR=8 to ~3.8x at TR=64, and
the lane-gather count per output pixel drops by the same factor.

Exact whenever |dy| <= D_V and |dx| <= D_H for every pixel; callers wrap it
in `flow_warp_auto`, which checks the actual flow bounds at runtime and
falls back to the exact XLA gather path via lax.cond otherwise.

Layout: planar (C, H, W) inside the kernel (W in lanes); NHWC at the API.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import flow_warp as _flow_warp_xla
from .warp import flow_warp_lowmem as _flow_warp_xla_lowmem

# flows at or below this bound take the SMALL-WINDOW kernel (d_v=3): the
# masked-scan work per output tile scales with win_r = tr + 2*d_v + 2, so a
# d_v=3 window (win_r=16) does 6x less vector work than the full d_v=27/43
# window.  Measured at 1080p/48ch (tools/warp_tier_bench.py): single-flow
# 56 ms (vs 184 ms d_v=27, 191 ms shift-sum); grouped 81 ms (vs 370 ms
# d_v=43, 1014 ms shift-sum).  The shift-sum elementwise formulation LOSES
# to the windowed kernel at these sizes — its (2b+2)^2 taps each re-read a
# full padded copy plus per-tap weight maps; it is kept in ops/warp.py as
# the reference implementation.  Trained codec flows are a few pixels, so
# this small-window tier is the steady-state deployment path.
_SMALL_BOUND = 2
_SMALL_D_V = 3
# Mid cblock tier for the OffsetDiversity grouped warp: trained offset
# heads emit ~8-11 px diversity offsets (max_residue_magnitude*tanh;
# measured on the round-5 trained checkpoints), which overflow the tiny
# tier and previously fell to the full 43x63 windowed kernel — the
# reason a trained checkpoint served 2.4x slower than random init at
# identical flow tiers elsewhere.  b=12 covers the measured offsets with
# margin at ~1/3 the windowed kernel's vertical scan.
_MID_BOUND = 12
_MID_D_V = 15

TILE_C = 128
_VREG_R = 8  # sublane count: window rows are processed in 8-row chunks

# A/B switches for the tiny-tier kernel: LSSVC_WARP_ROLL=1 selects the
# roll-tap variant (lane rotations instead of dynamic lane gathers);
# LSSVC_WARP_WIDE=1 selects the wide cross-vreg gather variant — which
# DOES NOT COMPILE on real TPUs: Mosaic's gather lowering asserts
# same-shape indices (one vreg), so a (8, 256) row cannot be gathered
# with (8, 128) indices.  Kept for the record; interpret mode only.
_USE_ROLL = os.environ.get("LSSVC_WARP_ROLL", "0") == "1"
_USE_WIDE = os.environ.get("LSSVC_WARP_WIDE", "0") == "1"
# LSSVC_WARP_NHWC_OUT selects the fused-boundary tiny-tier variant: the
# kernel transposes each output tile in-register (MXU identity-dot, exact
# for bf16 AND f32 — multiply-by-1 against non-overlapping bf16x3 splits
# reassembles f32 exactly) and stores NHWC directly, eliminating the
# planar->NHWC XLA transpose pass over the full-res tensor.
#   "1" = identity-dot transpose (MXU), "t" = jnp.transpose (Mosaic
#   relayout), "0" = off (planar store + XLA transpose).
# Default "1": measured best on-chip (1.582 fps vs 1.579 for "t" at
# two-layer 1080p, runs/chip_abs_r3.log) and it sidesteps the planar
# store entirely (the 2026-08 Mosaic update rejects dynamic sublane-dim
# stores; the planar path now stores row-planar instead, see
# _grouped_warp_kernel_cblock).
_NHWC_OUT = os.environ.get("LSSVC_WARP_NHWC_OUT", "1")


def _pad_to(v, m):
    return (v + m - 1) // m * m


def _pick_tile_r(h):
    """8 everywhere: each window row is processed against the WHOLE
    (tr, 128) tile, so per-output-pixel vector work scales with
    win_r = tr + 2*d_v + 2 alone — smaller tiles do strictly less VPU work
    (tr=8/d_v=27: 64 rows vs tr=64's 120; measured 107 ms vs 220 ms for a
    48-ch 1080p warp).  The price is window-DMA read amplification
    ((64*256)/(8*128) = 16x), but that is ~8 ms of HBM traffic at 1080p —
    noise next to the gather arithmetic."""
    del h
    return 8


def _sample_coords(fx, fy, ti, tj, tr, h, w, d_v, d_h, win_r, win_c):
    """Clamped global bilinear sample positions and window-local indices for
    one (tr, TILE_C) output tile.  tpu.iota must be integer-typed."""
    iy = (jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 0)
          + ti * tr).astype(jnp.float32)
    ix = (jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 1)
          + tj * TILE_C).astype(jnp.float32)
    px = jnp.clip(ix + fx, 0.0, w - 1.0)
    py = jnp.clip(iy + fy, 0.0, h - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    # local (window) coords; the pad guarantees these are in range whenever
    # |flow| <= (d_v, d_h)
    lx0 = jnp.clip(x0.astype(jnp.int32) - (tj * TILE_C - d_h - 1),
                   0, win_c - 2)
    ly0 = jnp.clip(y0.astype(jnp.int32) - (ti * tr - d_v - 1),
                   0, win_r - 2)
    return lx0, ly0, wx, wy


def _h_selectors(lx0, wx, n_cu):
    """Per window-column-chunk lane indices, chunk-hit masks and horizontal
    weights (shared across channels and window rows)."""
    one = jnp.float32(1.0)
    hsel = []
    for cu in range(n_cu):
        l0 = lx0 - cu * TILE_C
        l1 = l0 + 1
        w0 = jnp.where((l0 >= 0) & (l0 < TILE_C), one - wx, 0.0)
        w1 = jnp.where((l1 >= 0) & (l1 < TILE_C), wx, 0.0)
        hsel.append((jnp.clip(l0, 0, TILE_C - 1),
                     jnp.clip(l1, 0, TILE_C - 1), w0, w1))
    return hsel


def _broadcast_row(seg, s_loc, tr):
    """Broadcast window row s_loc of an (8, TILE_C) segment across tr
    sublanes via a constant-index sublane gather (vector.broadcast of a
    row slice is unsupported in Mosaic), then stack to (tr, TILE_C)."""
    cidx = jnp.full((_VREG_R, TILE_C), s_loc, jnp.int32)
    row8 = jnp.take_along_axis(seg, cidx, axis=0)
    if tr == _VREG_R:
        return row8
    return jnp.concatenate([row8] * (tr // _VREG_R), axis=0)


def _warp_kernel(fx_ref, fy_ref, x_ref, out_ref, win_ref, sem,
                 *, d_v, d_h, h, w, n_chan, tr):
    """Grid: (H/tr, W/TILE_C). x_ref: padded planar (C, H+, W+) in HBM;
    fx/fy: (tr, TILE_C) VMEM blocks; out: (C, tr, TILE_C)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cu = win_c // TILE_C
    n_rv = win_r // _VREG_R

    # source window top-left in padded coords: tile origin minus (d_v+1)
    # (padded array has origin shifted by +d_v+1, so offset = tile origin)
    copy = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(ti * tr, win_r), pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()

    lx0, ly0, wx, wy = _sample_coords(fx_ref[:], fy_ref[:], ti, tj, tr,
                                      h, w, d_v, d_h, win_r, win_c)
    hsel = _h_selectors(lx0, wx, n_cu)
    one = jnp.float32(1.0)

    copy.wait()

    def zero_body(c, _):
        out_ref[c, :, :] = jnp.zeros((tr, TILE_C), jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chan, zero_body, 0)

    # outer loop over window-row chunks: the vertical weights vw depend only
    # on the window row, so hoisting them out of the channel loop removes
    # ~45% of the per-channel vector work (measured at 48 channels)
    def rv_body(rv, _):
        vws = []
        for s_loc in range(_VREG_R):
            s = rv * _VREG_R + s_loc
            vws.append((ly0 == s).astype(jnp.float32) * (one - wy)
                       + (ly0 + 1 == s).astype(jnp.float32) * wy)

        def chan_body(c, _):
            acc = out_ref[c, :, :]
            for cu in range(n_cu):
                seg = win_ref[c, pl.ds(rv * _VREG_R, _VREG_R),
                              cu * TILE_C:(cu + 1) * TILE_C]
                i0, i1, w0, w1 = hsel[cu]
                for s_loc in range(_VREG_R):
                    row = _broadcast_row(seg, s_loc, tr)
                    g0 = jnp.take_along_axis(row, i0, axis=1)
                    g1 = jnp.take_along_axis(row, i1, axis=1)
                    acc = acc + (g0 * w0 + g1 * w1) * vws[s_loc]
            out_ref[c, :, :] = acc
            return 0

        jax.lax.fori_loop(0, n_chan, chan_body, 0)
        return 0

    jax.lax.fori_loop(0, n_rv, rv_body, 0)


def _smallflow_weights(fx, fy, ti, tj, tr, h, w, b, d_v, d_h, win_r, win_c):
    """36 combined (tr, TILE_C) tap-weight maps for the shift-sum kernel:
    tap (ry, rx) carries bilinear weight wherever the clamped sample's
    floor cell (or its +1 neighbor) lands on that relative offset."""
    lx0, ly0, wx, wy = _sample_coords(fx, fy, ti, tj, tr, h, w, d_v, d_h,
                                      win_r, win_c)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 1)
    ry0 = ly0 - (d_v + 1) - row_i  # floor-cell offset, in [-b, b]
    rx0 = lx0 - (d_h + 1) - lane
    one = jnp.float32(1.0)
    offs = list(range(-b, b + 2))
    wys = {r: (ry0 == r).astype(jnp.float32) * (one - wy)
           + (ry0 + 1 == r).astype(jnp.float32) * wy for r in offs}
    wxs = {r: (rx0 == r).astype(jnp.float32) * (one - wx)
           + (rx0 + 1 == r).astype(jnp.float32) * wx for r in offs}
    return [(d_v + 1 + ry, d_h + 1 + rx, wys[ry] * wxs[rx])
            for ry in offs for rx in offs]


def _warp_kernel_smallflow(fx_ref, fy_ref, x_ref, out_ref, win_ref, sem,
                           *, b, d_v, d_h, h, w, n_chan, tr):
    """|flow| <= b specialization: in-window shift-sum.  Every bilinear tap
    is a STATIC (sublane, lane)-offset slice of the VMEM window — the
    channel loop is pure slice+multiply+add, no dynamic gathers.

    MEASURED NEGATIVE RESULT (v5e, 2026-08): 158 ms vs 56 ms for the
    windowed-gather kernel at 48ch 1080p (grouped: 186 vs 81).  The
    36 unaligned (sublane, lane)-offset slices each lower to a multi-op
    relayout sequence in Mosaic, which outweighs the gather savings.  Kept
    (with tests) as the record of the experiment; the auto wrappers
    dispatch the tiny tier to the d_v=3 windowed kernel."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2

    copy = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(ti * tr, win_r), pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()
    taps = _smallflow_weights(fx_ref[:], fy_ref[:], ti, tj, tr, h, w,
                              b, d_v, d_h, win_r, win_c)
    copy.wait()

    def chan_body(c, _):
        acc = jnp.zeros((tr, TILE_C), jnp.float32)
        for ro, co, wt in taps:
            acc = acc + win_ref[c, pl.ds(ro, tr), co:co + TILE_C] * wt
        out_ref[c, :, :] = acc
        return 0

    jax.lax.fori_loop(0, n_chan, chan_body, 0)


def _tile_transpose(a, mode):
    """In-kernel (C, TILE_C) -> (TILE_C, C) tile transpose.

    mode "1": identity-dot on the MXU — dot(I[TILE_C,TILE_C], A,
    contract dim1 x dim1) = A^T.  Exact in bf16 (single product, f32
    accumulate) and in f32 (the bf16x3 split is a non-overlapping exact
    decomposition; x1.0 reassembles it losslessly).  mode "t": Mosaic's
    native relayout transpose.
    """
    if mode == "t":
        return jnp.transpose(a)
    n = a.shape[1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)).astype(a.dtype)
    return jax.lax.dot_general(eye, a, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_transpose_packed(a):
    """In-kernel (C, TILE_C) -> (TILE_C/2, 2*C) WIDTH-PACKED tile:
    out[j, ph*C + c] = a[c, 2j + ph] (`ops/packed.py:pack_width` layout,
    p=2).  Two half-height 0/1-selector dots on the MXU — the same
    exactness argument as `_tile_transpose` mode "1" (a selector row has
    a single 1; bf16 and split-f32 products of x*1 are exact) — so the
    kernel can store straight into the packed conv domain and the XLA
    `pack_width` relayout pass over the full-res output disappears."""
    n = a.shape[1]
    half = n // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (half, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (half, n), 1)
    dims = (((1,), (1,)), ((), ()))
    pe = jax.lax.dot_general((cols == 2 * rows).astype(a.dtype), a, dims,
                             preferred_element_type=jnp.float32)
    po = jax.lax.dot_general((cols == 2 * rows + 1).astype(a.dtype), a,
                             dims, preferred_element_type=jnp.float32)
    return jnp.concatenate([pe, po], axis=1)


def _warp_kernel_cblock(fx_ref, fy_ref, x_ref, out_ref, win_ref, sem,
                        *, b, d_v, d_h, h, w, n_chan, tr, nhwc_out="0"):
    """Small-flow kernel, channel-blocked: source window lives as
    (win_r, C, win_c) so one (8-channel, 128-lane) vreg load + lane gather
    serves 8 channels at once — 8x fewer dynamic gathers than the
    per-channel windowed kernel.  Loop order: output row i (dynamic) x
    relative tap row r (static, 2b+2) x column chunk x channel block.

    Requires C % 8 == 0 and |flow| <= b (the auto wrapper's tiny tier)."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cu = win_c // TILE_C
    n_cb = n_chan // _VREG_R

    copy = pltpu.make_async_copy(
        x_ref.at[pl.ds(ti * tr, win_r), :, pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()

    lx0, ly0, wx, wy = _sample_coords(fx_ref[:], fy_ref[:], ti, tj, tr,
                                      h, w, d_v, d_h, win_r, win_c)
    one = jnp.float32(1.0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 0)
    ry0 = ly0 - row_i  # window row offset of the floor tap, in [d_v+1-b ..]

    copy.wait()

    def row_body(i, _):
        def brow(t):
            idx = jnp.full((_VREG_R, TILE_C), i, jnp.int32)
            return jnp.take_along_axis(t, idx, axis=0)

        ry_i = brow(ry0.astype(jnp.float32))
        wy_i = brow(wy)
        hsel = []
        for cu in range(n_cu):
            l0 = lx0 - cu * TILE_C
            w0_full = jnp.where((l0 >= 0) & (l0 < TILE_C), one - wx, 0.0)
            w1_full = jnp.where((l0 + 1 >= 0) & (l0 + 1 < TILE_C), wx, 0.0)
            hsel.append((
                brow(jnp.clip(l0, 0, TILE_C - 1).astype(jnp.float32)
                     ).astype(jnp.int32),
                brow(jnp.clip(l0 + 1, 0, TILE_C - 1).astype(jnp.float32)
                     ).astype(jnp.int32),
                brow(w0_full), brow(w1_full)))
        rp_lo, rp_hi = d_v + 1 - b, d_v + 1 + b + 2
        # per-tap-row vertical weights, shared across chunks and channels
        vws = {}
        accs = []
        for cb in range(n_cb):
            # chunk contributions accumulate in-register (f32), one store
            # per (row, channel block) — out_ref may be bf16
            acc = jnp.zeros((_VREG_R, TILE_C), jnp.float32)
            for cu in range(n_cu):
                i0_i, i1_i, w0_i, w1_i = hsel[cu]

                def tap(rp, acc):
                    # vertical weight for tap row i+rp, broadcast over the
                    # 8 channels of this block
                    if isinstance(rp, int) and rp in vws:
                        vw = vws[rp]
                    else:
                        vw = ((ry_i == rp).astype(jnp.float32)
                              * (one - wy_i)
                              + (ry_i + 1 == rp).astype(jnp.float32)
                              * wy_i)
                        if isinstance(rp, int):
                            vws[rp] = vw
                    v = win_ref[i + rp, cb * _VREG_R:(cb + 1) * _VREG_R,
                                cu * TILE_C:(cu + 1) * TILE_C
                                ].astype(jnp.float32)
                    g0 = jnp.take_along_axis(v, i0_i, axis=1)
                    g1 = jnp.take_along_axis(v, i1_i, axis=1)
                    return acc + (g0 * w0_i + g1 * w1_i) * vw

                if rp_hi - rp_lo <= 12:  # tiny tier: unroll statically
                    for rp in range(rp_lo, rp_hi):
                        acc = tap(rp, acc)
                else:  # mid tier (large window): dynamic tap loop
                    acc = jax.lax.fori_loop(rp_lo, rp_hi, tap, acc)
            if nhwc_out != "0":
                accs.append(acc.astype(out_ref.dtype))
            else:
                out_ref[i, cb * _VREG_R:(cb + 1) * _VREG_R, :] = \
                    acc.astype(out_ref.dtype)
        if nhwc_out != "0":
            # fused output relayout: rounding point (astype above) is
            # identical to the planar store, so results are bit-equal
            a = accs[0] if n_cb == 1 else jnp.concatenate(accs, axis=0)
            if nhwc_out == "p":  # width-packed store (ops/packed.py p=2)
                out_ref[i, :, :] = _tile_transpose_packed(a
                                                          ).astype(out_ref.dtype)
            else:
                out_ref[i, :, :] = _tile_transpose(a, nhwc_out
                                                   ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tr, row_body, 0)


def _warp_kernel_cblock_wide(fx_ref, fy_ref, x_ref, out_ref, win_ref, sem,
                             *, b, d_v, d_h, h, w, n_chan, tr):
    """cblock variant with WIDE horizontal gathers: one take_along_axis
    over the full (8ch, win_c) window row per tap instead of a loop over
    128-lane chunks with hit masks — n_cu x fewer dynamic gathers and no
    per-chunk weight masking.  Indices are absolute window columns
    (in-range by construction: _sample_coords clips to [0, win_c-2]).

    NEGATIVE RESULT (2026-08): Mosaic cannot lower this — its gather rule
    asserts indices.shape == operand.shape (single-vreg lane gathers
    only), so cross-vreg addressing must be decomposed into per-chunk
    gathers + masks, which is exactly what `_warp_kernel_cblock` does.
    The chunked kernel is therefore already at the Mosaic-expressible
    minimum of 4 gathers per (tap row, out vreg).  Works in interpret
    mode only; kept as documentation."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cb = n_chan // _VREG_R

    copy = pltpu.make_async_copy(
        x_ref.at[pl.ds(ti * tr, win_r), :, pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()

    lx0, ly0, wx, wy = _sample_coords(fx_ref[:], fy_ref[:], ti, tj, tr,
                                      h, w, d_v, d_h, win_r, win_c)
    one = jnp.float32(1.0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 0)
    ry0 = ly0 - row_i  # window row offset of the floor tap

    copy.wait()

    def row_body(i, _):
        def brow(t):
            idx = jnp.full((_VREG_R, TILE_C), i, jnp.int32)
            return jnp.take_along_axis(t, idx, axis=0)

        ry_i = brow(ry0.astype(jnp.float32))
        wy_i = brow(wy)
        i0_i = brow(lx0.astype(jnp.float32)).astype(jnp.int32)
        i1_i = brow(jnp.minimum(lx0 + 1, win_c - 1).astype(jnp.float32)
                    ).astype(jnp.int32)
        w0_i = brow(one - wx)
        w1_i = brow(wx)
        for cb in range(n_cb):
            def tap(rp, acc):
                vw = ((ry_i == rp).astype(jnp.float32) * (one - wy_i)
                      + (ry_i + 1 == rp).astype(jnp.float32) * wy_i)
                v = win_ref[i + rp, cb * _VREG_R:(cb + 1) * _VREG_R,
                            :].astype(jnp.float32)
                g0 = jnp.take_along_axis(v, i0_i, axis=1)
                g1 = jnp.take_along_axis(v, i1_i, axis=1)
                return acc + (g0 * w0_i + g1 * w1_i) * vw

            rp_lo, rp_hi = d_v + 1 - b, d_v + 1 + b + 2
            acc = jnp.zeros((_VREG_R, TILE_C), jnp.float32)
            if rp_hi - rp_lo <= 12:
                for rp in range(rp_lo, rp_hi):
                    acc = tap(rp, acc)
            else:
                acc = jax.lax.fori_loop(rp_lo, rp_hi, tap, acc)
            out_ref[i, cb * _VREG_R:(cb + 1) * _VREG_R, :] = \
                acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tr, row_body, 0)


def _warp_kernel_cblock_roll(fx_ref, fy_ref, x_ref, out_ref, win_ref, sem,
                             *, b, d_v, d_h, h, w, n_chan, tr):
    """cblock variant with ROLL-based horizontal taps: instead of two
    dynamic lane gathers per (tap row, column chunk), accumulate 2b+3
    lane-rotations of the full window row, each weighted by a
    per-relative-offset mask.  Lane rotates are single crossbar ops where
    take_along_axis lowers to a general permute sequence; trades 24
    gathers for 42 roll+fma per (row, channel block) at b=2."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cb = n_chan // _VREG_R
    one = jnp.float32(1.0)

    copy = pltpu.make_async_copy(
        x_ref.at[pl.ds(ti * tr, win_r), :, pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()

    lx0, ly0, wx, wy = _sample_coords(fx_ref[:], fy_ref[:], ti, tj, tr,
                                      h, w, d_v, d_h, win_r, win_c)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C), 1)
    ry0 = ly0 - row_i
    rx0 = lx0 - (d_h + 1) - lane  # in [-(b+1), b+1] for in-image pixels

    copy.wait()

    rxs = list(range(-(b + 1), b + 2))
    rp_lo, rp_hi = d_v + 1 - b, d_v + 1 + b + 2

    def row_body(i, _):
        def brow(t):
            idx = jnp.full((_VREG_R, TILE_C), i, jnp.int32)
            return jnp.take_along_axis(t, idx, axis=0)

        ry_i = brow(ry0.astype(jnp.float32))
        wy_i = brow(wy)
        rx_i = brow(rx0.astype(jnp.float32))
        wx_i = brow(wx)
        # per-relative-column weights, shared across tap rows and channels
        whx = [(rx_i == rx).astype(jnp.float32) * (one - wx_i)
               + (rx_i == rx - 1).astype(jnp.float32) * wx_i for rx in rxs]
        vws = [((ry_i == rp).astype(jnp.float32) * (one - wy_i)
                + (ry_i + 1 == rp).astype(jnp.float32) * wy_i)
               for rp in range(rp_lo, rp_hi)]
        for cb in range(n_cb):
            acc = jnp.zeros((_VREG_R, TILE_C), jnp.float32)
            for rj, rp in enumerate(range(rp_lo, rp_hi)):
                v = win_ref[i + rp, cb * _VREG_R:(cb + 1) * _VREG_R, :]
                for rk, rx in enumerate(rxs):
                    # left-rotate by (d_h+1+rx) = right-rotate by the
                    # complement (pltpu.roll requires shift >= 0)
                    u = pltpu.roll(v, win_c - (d_h + 1 + rx),
                                   axis=1)[:, :TILE_C].astype(jnp.float32)
                    acc = acc + u * (whx[rk] * vws[rj])
            out_ref[i, cb * _VREG_R:(cb + 1) * _VREG_R, :] = \
                acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tr, row_body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _flow_warp_pallas_cblock(x, flow_x, flow_y, b=_SMALL_BOUND,
                             d_v=_SMALL_D_V, d_h=63, packed_out=False):
    """Channel-blocked small-flow tier: see _warp_kernel_cblock.

    bf16 inputs stay bf16 through the planar transpose, halo pad, window
    DMA and the output transpose (the boundary relayouts are ~half the
    tier's measured cost, tools/warp_overhead_bench.py); taps convert to
    f32 in-register and accumulate in f32, so only the already-bf16 input
    values and the bf16 output store round — same rounding points as the
    serving mode's conv outputs.

    packed_out=True stores the result directly in the width-packed conv
    domain, (N, H, W/2, 2C) with packed channel (w%2)*C + c — see
    `_tile_transpose_packed`.  Requires the default cblock kernel and an
    even W."""
    n, h, w, c = x.shape
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    x = x.astype(dt)
    flow_x = flow_x.astype(jnp.float32)
    flow_y = flow_y.astype(jnp.float32)
    if n > 1:
        return jnp.concatenate(
            [_flow_warp_pallas_cblock(x[i:i + 1], flow_x[i:i + 1],
                                      flow_y[i:i + 1], b, d_v, d_h,
                                      packed_out)
             for i in range(n)], axis=0)
    if c % _VREG_R:  # pad channels to the 8-sublane block (e.g. RGB warps)
        cp = _pad_to(c, _VREG_R)
        out = _flow_warp_pallas_cblock(
            jnp.pad(x, ((0, 0),) * 3 + ((0, cp - c),)), flow_x, flow_y,
            b, d_v, d_h, packed_out)
        if packed_out:  # packed channels: [pad-C phase 0, pad-C phase 1]
            return jnp.concatenate([out[..., :c], out[..., cp:cp + c]],
                                   axis=-1)
        return out[..., :c]
    tr = _pick_tile_r(h)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0 and win_r % _VREG_R == 0

    hp = _pad_to(h, tr)
    wp = _pad_to(w, TILE_C)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        x = jnp.pad(x, pad + ((0, 0),))
        flow_x = jnp.pad(flow_x, pad)
        flow_y = jnp.pad(flow_y, pad)

    # (H, C, W) planar: window slices load (8ch, 128lane) vregs directly
    planar = jnp.transpose(x[0], (0, 2, 1))
    padded = jnp.pad(planar, ((d_v + 1, d_v + 1 + tr), (0, 0),
                              (d_h + 1, d_h + 1 + TILE_C)))
    grid = (hp // tr, wp // TILE_C)
    interpret = jax.default_backend() != "tpu"
    nhwc_out = _NHWC_OUT if not (_USE_ROLL or _USE_WIDE) else "0"
    if packed_out:
        assert w % 2 == 0, "packed_out requires an even output width"
        assert not (_USE_ROLL or _USE_WIDE), \
            "packed_out is implemented for the default cblock kernel only"
        nhwc_out = "p"
    kernel = (_warp_kernel_cblock_roll if _USE_ROLL
              else _warp_kernel_cblock_wide if _USE_WIDE
              else functools.partial(_warp_kernel_cblock,
                                     nhwc_out=nhwc_out))
    if nhwc_out == "p":
        out_shape = jax.ShapeDtypeStruct((hp, wp // 2, 2 * c), dt)
        out_specs = pl.BlockSpec((tr, TILE_C // 2, 2 * c),
                                 lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    elif nhwc_out != "0":
        out_shape = jax.ShapeDtypeStruct((hp, wp, c), dt)
        out_specs = pl.BlockSpec((tr, TILE_C, c), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((hp, c, wp), dt)
        out_specs = pl.BlockSpec((tr, c, TILE_C), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel, b=b, d_v=d_v, d_h=d_h,
                          h=h, w=w, n_chan=c, tr=tr),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((win_r, c, win_c), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flow_x[0], flow_y[0], padded)
    if nhwc_out == "p":
        return out[None, :h, :w // 2, :]
    if nhwc_out != "0":
        return out[None, :h, :w, :]
    return jnp.transpose(out, (0, 2, 1))[None, :h, :w, :]


def _grouped_warp_kernel_cblock(fx_ref, fy_ref, mask_ref, x_ref, out_ref,
                                win_ref, sem, *, b, d_v, d_h, h, w, go, tr,
                                nhwc_out="0"):
    """Grouped small-flow kernel, channel-blocked: the source arrives
    PRE-EXPANDED to block layout (H, go*cg, W) (channel c' = k*go + j is
    unit j's source channel k), so a block of 8 consecutive c' within one k
    maps to 8 consecutive warp units — one (8, 128) vreg load + one
    take_along_axis with PER-SUBLANE indices warps 8 units at once.

    Flows/mask arrive stripe-major (tr, go, TILE_C): the (8-unit, 128-lane)
    stripe at output row i is a clean contiguous vreg load, and sample
    coordinates are computed inline per stripe (no scratch round-trip).
    Requires |flow| <= b and go % 8 == 0."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cu = win_c // TILE_C
    # block-layout channel count go*cg (dim 1 row-planar, dim 2 NHWC-out;
    # the packed store carries BOTH width phases, 2x the channels)
    c_blk = out_ref.shape[2] if nhwc_out != "0" else out_ref.shape[1]
    if nhwc_out == "p":
        c_blk //= 2
    cg = c_blk // go
    n_ub = go // _VREG_R
    one = jnp.float32(1.0)

    copy = pltpu.make_async_copy(
        x_ref.at[pl.ds(ti * tr, win_r), :, pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()
    lane = jax.lax.broadcasted_iota(jnp.int32, (_VREG_R, TILE_C), 1)
    ix = (lane + tj * TILE_C).astype(jnp.float32)
    copy.wait()

    def row_body(i, _):
        iy = (ti * tr + i).astype(jnp.float32)
        accs = {}
        for ub in range(n_ub):
            us = ub * _VREG_R
            fx = fx_ref[i, us:us + _VREG_R, :]
            fy = fy_ref[i, us:us + _VREG_R, :]
            px = jnp.clip(ix + fx, 0.0, w - 1.0)
            py = jnp.clip(iy + fy, 0.0, h - 1.0)
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            wx = px - x0
            wy = py - y0
            lx0 = jnp.clip(x0.astype(jnp.int32) - (tj * TILE_C - d_h - 1),
                           0, win_c - 2)
            ly0 = jnp.clip(y0.astype(jnp.int32) - (ti * tr - d_v - 1),
                           0, win_r - 2)
            ry0 = ly0 - i  # window-row offset of the floor tap
            for k in range(cg):
                acc = jnp.zeros((_VREG_R, TILE_C), jnp.float32)
                for cu in range(n_cu):
                    l0 = lx0 - cu * TILE_C
                    w0 = jnp.where((l0 >= 0) & (l0 < TILE_C), one - wx, 0.0)
                    w1 = jnp.where((l0 + 1 >= 0) & (l0 + 1 < TILE_C),
                                   wx, 0.0)
                    i0 = jnp.clip(l0, 0, TILE_C - 1)
                    i1 = jnp.clip(l0 + 1, 0, TILE_C - 1)

                    def tap(rp, acc):
                        vw = ((ry0 == rp).astype(jnp.float32) * (one - wy)
                              + (ry0 + 1 == rp).astype(jnp.float32) * wy)
                        v = win_ref[i + rp, k * go + us:k * go + us + _VREG_R,
                                    cu * TILE_C:(cu + 1) * TILE_C
                                    ].astype(jnp.float32)
                        g0 = jnp.take_along_axis(v, i0, axis=1)
                        g1 = jnp.take_along_axis(v, i1, axis=1)
                        return acc + (g0 * w0 + g1 * w1) * vw

                    if 2 * b + 2 <= 12:  # tiny tier: unroll statically
                        for rp in range(d_v + 1 - b, d_v + 1 + b + 2):
                            acc = tap(rp, acc)
                    else:  # mid tier: dynamic tap-row loop (the full
                        # unroll at b=12 is 26 taps x chunks x channels —
                        # Mosaic compile blows up; dynamic index on the
                        # untiled major window dim is fine)
                        acc = jax.lax.fori_loop(d_v + 1 - b,
                                                d_v + 1 + b + 2, tap, acc)
                m = mask_ref[i, us:us + _VREG_R, :]
                if nhwc_out != "0":
                    accs[k * go + us] = (acc * m).astype(out_ref.dtype)
                else:
                    # row-planar store: dynamic index on the untiled major
                    # dim, static 8-aligned sublane slice (a dynamic
                    # SUBLANE index here is rejected by Mosaic — the
                    # 2026-08 compile-helper update enforces it)
                    out_ref[i, k * go + us:k * go + us + _VREG_R, :] = \
                        (acc * m).astype(out_ref.dtype)
        if nhwc_out != "0":
            # fused output relayout in channel order (same rounding point
            # as the planar store -> bit-equal results)
            a = jnp.concatenate([accs[cs] for cs in sorted(accs)], axis=0)
            if nhwc_out == "p":  # width-packed store (ops/packed.py p=2)
                out_ref[i, :, :] = _tile_transpose_packed(a
                                                          ).astype(out_ref.dtype)
            else:
                out_ref[i, :, :] = _tile_transpose(a, nhwc_out
                                                   ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tr, row_body, 0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _grouped_warp_pallas_cblock(x, flow_x, flow_y, mask, group_num,
                                b=_SMALL_BOUND, d_v=_SMALL_D_V, d_h=63,
                                packed_out=False):
    """Grouped channel-blocked small-flow tier: see
    _grouped_warp_kernel_cblock.  Expands the source to block layout
    (one XLA concat) outside the kernel.  bf16 sources stay bf16 through
    the expansion/transpose/window DMA (see _flow_warp_pallas_cblock);
    flows and masks stay f32."""
    n, h, w, c_src = x.shape
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    x = x.astype(dt)
    flow_x = flow_x.astype(jnp.float32)
    flow_y = flow_y.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    if n > 1:
        return jnp.concatenate(
            [_grouped_warp_pallas_cblock(x[i:i + 1], flow_x[i:i + 1],
                                         flow_y[i:i + 1], mask[i:i + 1],
                                         group_num, b, d_v, d_h, packed_out)
             for i in range(n)], axis=0)
    go = flow_x.shape[-1]
    offset_num = go // group_num
    cg = c_src // group_num
    assert go % _VREG_R == 0
    tr = _pick_tile_r(h)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0 and win_r % _VREG_R == 0

    hp = _pad_to(h, tr)
    wp = _pad_to(w, TILE_C)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        x = jnp.pad(x, pad)
        flow_x = jnp.pad(flow_x, pad)
        flow_y = jnp.pad(flow_y, pad)
        mask = jnp.pad(mask, pad)

    # block-layout expansion: channel c' = k*go + j  <-  x[..., (j%G)*cg + k]
    planes = [x[0, ..., k::cg] for k in range(cg)]  # each (H, W, group_num)
    x_blk = jnp.concatenate([p for plane in planes
                             for p in (plane,) * offset_num], axis=-1)
    planar = jnp.transpose(x_blk, (0, 2, 1))  # (H, go*cg, W)
    padded = jnp.pad(planar, ((d_v + 1, d_v + 1 + tr), (0, 0),
                              (d_h + 1, d_h + 1 + TILE_C)))
    # stripe-major flows/mask: (H, go, W)
    fxp = jnp.transpose(flow_x[0], (0, 2, 1))
    fyp = jnp.transpose(flow_y[0], (0, 2, 1))
    mp = jnp.transpose(mask[0], (0, 2, 1))

    grid = (hp // tr, wp // TILE_C)
    interpret = jax.default_backend() != "tpu"
    nhwc_out = _NHWC_OUT
    if packed_out:
        assert w % 2 == 0, "packed_out requires an even output width"
        nhwc_out = "p"
    if nhwc_out == "p":
        out_shape = jax.ShapeDtypeStruct((hp, wp // 2, 2 * go * cg), dt)
        out_specs = pl.BlockSpec((tr, TILE_C // 2, 2 * go * cg),
                                 lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    elif nhwc_out != "0":
        out_shape = jax.ShapeDtypeStruct((hp, wp, go * cg), dt)
        out_specs = pl.BlockSpec((tr, TILE_C, go * cg),
                                 lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    else:
        # row-planar (hp, go*cg, wp): the kernel stores full 8-channel
        # sublane slices at static offsets per row (see store comment)
        out_shape = jax.ShapeDtypeStruct((hp, go * cg, wp), dt)
        out_specs = pl.BlockSpec((tr, go * cg, TILE_C),
                                 lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_grouped_warp_kernel_cblock, b=b, d_v=d_v,
                          d_h=d_h, h=h, w=w, go=go, tr=tr,
                          nhwc_out=nhwc_out),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, go, TILE_C), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, go, TILE_C), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, go, TILE_C), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((win_r, go * cg, win_c), dt),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(fxp, fyp, mp, padded)
    if nhwc_out == "p":
        return out[None, :h, :w // 2, :]
    if nhwc_out != "0":
        return out[None, :h, :w, :]
    return jnp.transpose(out, (0, 2, 1))[None, :h, :w, :]


def _grouped_warp_kernel_smallflow(fx_ref, fy_ref, mask_ref, x_ref, out_ref,
                                   win_ref, sem, *, b, d_v, d_h, h, w,
                                   group_num, offset_num, cg, tr):
    """Grouped (OffsetDiversity) variant of the shift-sum kernel: per warp
    unit j, 36 static-slice taps over its feature group's cg channels."""
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    go = group_num * offset_num
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2

    copy = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(ti * tr, win_r), pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()
    copy.wait()

    def unit_body(j, _):
        taps = _smallflow_weights(fx_ref[j, :, :], fy_ref[j, :, :], ti, tj,
                                  tr, h, w, b, d_v, d_h, win_r, win_c)
        mask = mask_ref[j, :, :]
        g_feat = j % group_num
        for t in range(cg):
            acc = jnp.zeros((tr, TILE_C), jnp.float32)
            for ro, co, wt in taps:
                acc = acc + win_ref[g_feat * cg + t, pl.ds(ro, tr),
                                    co:co + TILE_C] * wt
            out_ref[t * go + j, :, :] = acc * mask
        return 0

    jax.lax.fori_loop(0, go, unit_body, 0)


def _grouped_warp_kernel(fx_ref, fy_ref, mask_ref, x_ref, out_ref, win_ref,
                         sem, *, d_v, d_h, h, w, group_num, offset_num, cg,
                         tr):
    """OffsetDiversity grouped warp: `go = group_num*offset_num` warp units,
    unit j warps feature group (j % group_num)'s `cg` channels by its own
    flow and multiplies its mask.

    Grid (H/tr, W/TILE_C).  x_ref: padded planar source (C_src, H+, W+) in
    HBM; fx/fy/mask: planar (go, tr, TILE_C) VMEM blocks; out block layout
    c' = k*go + j (matches models.lssvc_blocks block layout).
    """
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    go = group_num * offset_num
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    n_cu = win_c // TILE_C
    n_rv = win_r // _VREG_R
    one = jnp.float32(1.0)

    copy = pltpu.make_async_copy(
        x_ref.at[:, pl.ds(ti * tr, win_r), pl.ds(tj * TILE_C, win_c)],
        win_ref, sem)
    copy.start()
    copy.wait()

    def unit_body(j, _):
        lx0, ly0, wx, wy = _sample_coords(
            fx_ref[j, :, :], fy_ref[j, :, :], ti, tj, tr,
            h, w, d_v, d_h, win_r, win_c)
        hsel = _h_selectors(lx0, wx, n_cu)
        mask = mask_ref[j, :, :]
        g_feat = j % group_num

        def rv_body(rv, accs):
            # vertical weights shared across the cg channels of this unit
            vws = []
            for s_loc in range(_VREG_R):
                s = rv * _VREG_R + s_loc
                vws.append((ly0 == s).astype(jnp.float32) * (one - wy)
                           + (ly0 + 1 == s).astype(jnp.float32) * wy)
            new_accs = list(accs)
            for t in range(cg):
                for cu in range(n_cu):
                    i0, i1, w0, w1 = hsel[cu]
                    seg = win_ref[g_feat * cg + t,
                                  pl.ds(rv * _VREG_R, _VREG_R),
                                  cu * TILE_C:(cu + 1) * TILE_C]
                    for s_loc in range(_VREG_R):
                        row = _broadcast_row(seg, s_loc, tr)
                        g0 = jnp.take_along_axis(row, i0, axis=1)
                        g1 = jnp.take_along_axis(row, i1, axis=1)
                        new_accs[t] = new_accs[t] + \
                            (g0 * w0 + g1 * w1) * vws[s_loc]
            return tuple(new_accs)

        accs = jax.lax.fori_loop(
            0, n_rv, rv_body,
            tuple(jnp.zeros((tr, TILE_C), jnp.float32)
                  for _ in range(cg)))
        for t in range(cg):
            out_ref[t * go + j, :, :] = accs[t] * mask
        return 0

    jax.lax.fori_loop(0, go, unit_body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _flow_warp_pallas_small(x, flow_x, flow_y, b=_SMALL_BOUND,
                            d_v=_SMALL_D_V, d_h=63):
    """Shift-sum tier for |flow| <= b: see _warp_kernel_smallflow."""
    n, h, w, c = x.shape
    if n > 1:
        return jnp.concatenate(
            [_flow_warp_pallas_small(x[i:i + 1], flow_x[i:i + 1],
                                     flow_y[i:i + 1], b, d_v, d_h)
             for i in range(n)], axis=0)
    tr = _pick_tile_r(h)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0 and win_r % _VREG_R == 0

    hp = _pad_to(h, tr)
    wp = _pad_to(w, TILE_C)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        x = jnp.pad(x, pad + ((0, 0),))
        flow_x = jnp.pad(flow_x, pad)
        flow_y = jnp.pad(flow_y, pad)

    planar = jnp.transpose(x[0], (2, 0, 1))
    padded = jnp.pad(planar, ((0, 0), (d_v + 1, d_v + 1 + tr),
                              (d_h + 1, d_h + 1 + TILE_C)))
    grid = (hp // tr, wp // TILE_C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_warp_kernel_smallflow, b=b, d_v=d_v, d_h=d_h,
                          h=h, w=w, n_chan=c, tr=tr),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((c, tr, TILE_C), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, win_r, win_c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flow_x[0], flow_y[0], padded)
    return jnp.transpose(out, (1, 2, 0))[None, :h, :w, :]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _grouped_warp_pallas_small(x, flow_x, flow_y, mask, group_num,
                               b=_SMALL_BOUND, d_v=_SMALL_D_V, d_h=63):
    """Grouped shift-sum tier for |flow| <= b."""
    n, h, w, c_src = x.shape
    if n > 1:
        return jnp.concatenate(
            [_grouped_warp_pallas_small(x[i:i + 1], flow_x[i:i + 1],
                                        flow_y[i:i + 1], mask[i:i + 1],
                                        group_num, b, d_v, d_h)
             for i in range(n)], axis=0)
    go = flow_x.shape[-1]
    offset_num = go // group_num
    cg = c_src // group_num
    tr = _pick_tile_r(h)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0 and win_r % _VREG_R == 0

    hp = _pad_to(h, tr)
    wp = _pad_to(w, TILE_C)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        x = jnp.pad(x, pad)
        flow_x = jnp.pad(flow_x, pad)
        flow_y = jnp.pad(flow_y, pad)
        mask = jnp.pad(mask, pad)

    planar = jnp.transpose(x[0], (2, 0, 1))
    padded = jnp.pad(planar, ((0, 0), (d_v + 1, d_v + 1 + tr),
                              (d_h + 1, d_h + 1 + TILE_C)))
    fxp = jnp.transpose(flow_x[0], (2, 0, 1))
    fyp = jnp.transpose(flow_y[0], (2, 0, 1))
    mp = jnp.transpose(mask[0], (2, 0, 1))

    grid = (hp // tr, wp // TILE_C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_grouped_warp_kernel_smallflow, b=b, d_v=d_v,
                          d_h=d_h, h=h, w=w, group_num=group_num,
                          offset_num=offset_num, cg=cg, tr=tr),
        out_shape=jax.ShapeDtypeStruct((go * cg, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((go, tr, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((go, tr, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((go, tr, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((go * cg, tr, TILE_C),
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
    return jnp.transpose(out, (1, 2, 0))[None, :h, :w, :]


@functools.partial(jax.jit, static_argnums=(3, 4))
def _flow_warp_pallas(x, flow_x, flow_y, d_v, d_h):
    """x: (N, H, W, C); flow_x/flow_y: (N, H, W). Arbitrary H/W — padded to
    the (tr, 128) tile grid internally; border clamping uses the TRUE size.
    Batch is a static unroll of per-image kernel launches (batch-of-
    sequences serving; launch cost is negligible at the kernel's scale)."""
    n, h, w, c = x.shape
    if n > 1:
        return jnp.concatenate(
            [_flow_warp_pallas(x[b:b + 1], flow_x[b:b + 1], flow_y[b:b + 1],
                               d_v, d_h) for b in range(n)], axis=0)
    tr = _pick_tile_r(h)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0, "2*d_h+2 must be a multiple of 128"
    assert win_r % _VREG_R == 0, "tr + 2*d_v+2 must be a multiple of 8"

    hp = _pad_to(h, tr)
    wp = _pad_to(w, TILE_C)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w))
        x = jnp.pad(x, pad + ((0, 0),))
        flow_x = jnp.pad(flow_x, pad)
        flow_y = jnp.pad(flow_y, pad)

    planar = jnp.transpose(x[0], (2, 0, 1))  # (C, H, W)
    padded = jnp.pad(planar, ((0, 0), (d_v + 1, d_v + 1 + tr),
                              (d_h + 1, d_h + 1 + TILE_C)))

    grid = (hp // tr, wp // TILE_C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_warp_kernel, d_v=d_v, d_h=d_h, h=h, w=w,
                          n_chan=c, tr=tr),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, TILE_C), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # padded source stays in HBM
        ],
        out_specs=pl.BlockSpec((c, tr, TILE_C), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, win_r, win_c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(flow_x[0], flow_y[0], padded)
    return jnp.transpose(out, (1, 2, 0))[None, :h, :w, :]


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _grouped_warp_pallas(x, flow_x, flow_y, mask, d_v, d_h, group_num):
    """x: (N, H, W, C_src); flow_x/flow_y/mask: (N, H, W, go).
    Returns (N, H, W, go * cg) in block channel layout c' = k*go + j.
    Batch unrolls into per-image kernel launches (see _flow_warp_pallas)."""
    n, h, w, c_src = x.shape
    if n > 1:
        return jnp.concatenate(
            [_grouped_warp_pallas(x[b:b + 1], flow_x[b:b + 1],
                                  flow_y[b:b + 1], mask[b:b + 1],
                                  d_v, d_h, group_num) for b in range(n)],
            axis=0)
    go = flow_x.shape[-1]
    offset_num = go // group_num
    cg = c_src // group_num
    tr = _pick_tile_r(h)
    win_r = tr + 2 * d_v + 2
    win_c = TILE_C + 2 * d_h + 2
    assert win_c % TILE_C == 0 and win_r % _VREG_R == 0

    hp = _pad_to(h, tr)
    wp = _pad_to(w, TILE_C)
    if (hp, wp) != (h, w):
        pad = ((0, 0), (0, hp - h), (0, wp - w), (0, 0))
        x = jnp.pad(x, pad)
        flow_x = jnp.pad(flow_x, pad)
        flow_y = jnp.pad(flow_y, pad)
        mask = jnp.pad(mask, pad)

    planar = jnp.transpose(x[0], (2, 0, 1))
    padded = jnp.pad(planar, ((0, 0), (d_v + 1, d_v + 1 + tr),
                              (d_h + 1, d_h + 1 + TILE_C)))
    fxp = jnp.transpose(flow_x[0], (2, 0, 1))
    fyp = jnp.transpose(flow_y[0], (2, 0, 1))
    mp = jnp.transpose(mask[0], (2, 0, 1))

    grid = (hp // tr, wp // TILE_C)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_grouped_warp_kernel, d_v=d_v, d_h=d_h, h=h, w=w,
                          group_num=group_num, offset_num=offset_num, cg=cg,
                          tr=tr),
        out_shape=jax.ShapeDtypeStruct((go * cg, hp, wp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((go, tr, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((go, tr, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((go, tr, TILE_C), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((go * cg, tr, TILE_C),
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
    return jnp.transpose(out, (1, 2, 0))[None, :h, :w, :]


_DIFFERENTIABLE = False


def set_warp_differentiable(on: bool):
    """Route the auto warp wrappers through the pure-XLA formulations
    (trace-time flag).  The pallas kernels have no JVP/VJP rules, so any
    graph that will be differentiated — the training steps — must take
    the XLA path even on TPU.  Training crops are small (128-256 px), so
    the XLA gather cost is acceptable there; inference keeps the kernels."""
    global _DIFFERENTIABLE
    _DIFFERENTIABLE = bool(on)


def flow_warp_auto(x, flow, d_v: int = 27, d_h: int = 63, fmax=None,
                   packed_out: bool = False):
    """Bilinear backward warp, three-tier runtime dispatch:

      |flow| <= 2            -> small-window pallas kernel (d_v=3, 6x less
                                scan work; the trained-codec steady state)
      |flow| within (d_v-1,
                     d_h-1)  -> full-window pallas kernel
      otherwise              -> exact XLA gather fallback

    `fmax` (optional traced scalar) is an upper bound on |flow| per axis;
    when the caller already knows one (e.g. the three scaled flows of one
    decoded motion field share max|mv| * {1, 1/2, 1/4}), passing it skips
    this warp's own full-resolution max-reductions.  An over-estimate only
    risks a slower tier, never a wrong result.

    Arbitrary H/W are padded up to the tile grid for the kernel and cropped
    back (padded pixels warp with zero flow and are discarded).

    `packed_out=True` returns the width-packed layout (N, H, W/2, 2C)
    (`ops/packed.py:pack_width`, p=2) for consumers in the packed conv
    domain: the tiny tier stores packed directly in-kernel (no XLA
    relayout pass over the full-res output); the other tiers pack after.
    Requires an even W.

    On non-TPU backends the kernel would run in interpret mode — correct but
    with minutes-long CPU compiles per shape — so the XLA path is used
    directly; dedicated kernel tests (tests/test_warp_pallas.py) exercise the
    pallas path in interpret mode at small shapes."""
    from . import spatial_ctx

    if packed_out:
        from .packed import pack_width

        def _pk(t):
            return pack_width(t, 2)
    if spatial_ctx.active():
        # H-sharded program: warp per shard on a neighbour-padded strip
        # (shard_map halo exchange; Pallas kernels run shard-locally)
        from ..parallel.spatial import flow_warp_sharded_auto

        if isinstance(fmax, (tuple, list)):  # sharded bound check is scalar
            fmax = jnp.maximum(jnp.asarray(fmax[0], jnp.float32),
                               jnp.asarray(fmax[1], jnp.float32))
        out = flow_warp_sharded_auto(x, flow, spatial_ctx.MESH,
                                     spatial_ctx.HALO, spatial_ctx.AXIS,
                                     fmax=fmax)
        return _pk(out) if packed_out else out
    if _DIFFERENTIABLE or jax.default_backend() != "tpu":
        out = _flow_warp_xla(x, flow)
        return _pk(out) if packed_out else out
    # bf16 inputs stay bf16 through the tiny tier (its boundary relayouts
    # run at half the bytes; taps still accumulate in f32); the mid/full
    # tiers upcast to f32 internally and cast back so every lax.cond
    # branch returns the same dtype
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    x = x.astype(dt)
    flow = flow.astype(jnp.float32)
    _, h, w, _ = x.shape
    fx = flow[..., 0]
    fy = flow[..., 1]
    if fmax is None:
        fx_max = jnp.max(jnp.abs(fx))
        fy_max = jnp.max(jnp.abs(fy))
        fmax = jnp.maximum(fx_max, fy_max)
        in_bounds = (fx_max <= d_h - 1) & (fy_max <= d_v - 1)
    elif isinstance(fmax, (tuple, list)):
        # per-axis bounds (fx_max, fy_max): the windowed tier's horizontal
        # window (d_h-1=62) is much wider than its vertical one (d_v-1=26);
        # a collapsed scalar bound would send |fx| in (26, 62] flows to the
        # slow lowmem fallback even though the kernel handles them
        fx_max = jnp.asarray(fmax[0], jnp.float32)
        fy_max = jnp.asarray(fmax[1], jnp.float32)
        fmax = jnp.maximum(fx_max, fy_max)
        in_bounds = (fx_max <= d_h - 1) & (fy_max <= d_v - 1)
    else:
        fmax = jnp.asarray(fmax, jnp.float32)
        in_bounds = fmax <= min(d_h, d_v) - 1
    tiny = fmax <= _SMALL_BOUND

    def windowed_or_gather(operands):
        # the fallback uses the sequential-tap formulation: XLA reserves HBM
        # for BOTH cond branches, and the eager gather's temps are GB-scale
        # at 1080p batch>1 even when the pallas branch runs
        out = jax.lax.cond(
            in_bounds,
            lambda ops: _flow_warp_pallas(
                ops[0].astype(jnp.float32), ops[1], ops[2], d_v,
                d_h).astype(dt),
            lambda ops: _flow_warp_xla_lowmem(
                ops[0].astype(jnp.float32), ops[3]).astype(dt),
            operands)
        return _pk(out) if packed_out else out

    return jax.lax.cond(
        tiny,
        lambda ops: _flow_warp_pallas_cblock(ops[0], ops[1], ops[2],
                                             _SMALL_BOUND, _SMALL_D_V, d_h,
                                             packed_out=packed_out),
        windowed_or_gather,
        (x, fx, fy, flow))


def flow_warp_pair(a, b, flow, fmax=None):
    """Warp two tensors by the SAME flow in one kernel dispatch.

    The per-warp cost is dominated by per-channel-block gathers, but each
    dispatch also pays bf16->f32 casts, |flow| max-reductions, the tier
    lax.conds and NHWC<->planar transposes; channel-concatenating
    same-flow warps (e.g. a model's warped reference frame + its warped
    full-res feature pyramid level) shares all of that.  Exact per
    channel: warping is channel-independent, so concat-warp-split equals
    two separate warps bit-for-bit on every tier."""
    ca = a.shape[-1]
    out = flow_warp_auto(jnp.concatenate([a, b], axis=-1), flow, fmax=fmax)
    return out[..., :ca], out[..., ca:]


def grouped_warp_auto(x, flow_x, flow_y, mask, group_num: int,
                      d_v: int = 43, d_h: int = 63,
                      packed_out: bool = False):
    """OffsetDiversity grouped warp with mask, block-layout output
    (c' = k*go + j): pallas fast path when every unit's offsets are within
    (d_v, d_h), XLA grouped-gather fallback otherwise.

    packed_out=True returns the width-packed layout (see flow_warp_auto).

    Non-TPU backends use the XLA path directly (see flow_warp_auto)."""
    from . import spatial_ctx

    if packed_out:
        from .packed import pack_width

        def _pk(t):
            return pack_width(t, 2)
    if spatial_ctx.active():
        from ..parallel.spatial import grouped_warp_sharded_auto

        out = grouped_warp_sharded_auto(x, flow_x, flow_y, mask,
                                        group_num, spatial_ctx.MESH,
                                        spatial_ctx.HALO_GROUPED,
                                        spatial_ctx.AXIS)
        return _pk(out) if packed_out else out
    from .warp import flow_warp_grouped, grouped_warp_lowmem

    # bf16 sources stay bf16 through the tiny tier's boundary relayouts
    # (mirrors flow_warp_auto; the cblock kernel accumulates in f32 and
    # emits dt) — a force-cast to f32 here would make the kernel's bf16
    # boundary path dead code from this, its only production caller
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    x = x.astype(dt)
    flow_x = flow_x.astype(jnp.float32)
    flow_y = flow_y.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    _, h, w, c_src = x.shape
    cg = c_src // group_num
    offset_num = flow_x.shape[-1] // group_num

    def _slow_eager(operands):
        x_, fx_, fy_, m_ = operands
        planes = [x_[..., k::cg] for k in range(cg)]
        x_blk = jnp.concatenate([p for plane in planes
                                 for p in (plane,) * offset_num], axis=-1)
        warped = flow_warp_grouped(x_blk.astype(jnp.float32), fx_, fy_)
        return warped * jnp.concatenate([m_] * cg, axis=-1)

    def slow(operands):
        # low-peak-memory per-unit scan: this branch's buffers are reserved
        # even when the pallas branch runs (see flow_warp_auto); f32
        # internally, cast back so every cond branch returns dt
        x_, fx_, fy_, m_ = operands
        out = grouped_warp_lowmem(x_.astype(jnp.float32), fx_, fy_, m_,
                                  group_num).astype(dt)
        return _pk(out) if packed_out else out

    if _DIFFERENTIABLE or jax.default_backend() != "tpu":
        out = _slow_eager((x, flow_x, flow_y, mask))
        return _pk(out) if packed_out else out

    fmax = jnp.maximum(jnp.max(jnp.abs(flow_x)), jnp.max(jnp.abs(flow_y)))
    tiny = fmax <= _SMALL_BOUND
    mid = fmax <= _MID_BOUND
    in_bounds = (jnp.max(jnp.abs(flow_x)) <= d_h - 1) & \
        (jnp.max(jnp.abs(flow_y)) <= d_v - 1)

    def fast(operands):
        x_, fx_, fy_, m_ = operands
        out = _grouped_warp_pallas(x_.astype(jnp.float32), fx_, fy_, m_,
                                   d_v, d_h, group_num).astype(dt)
        return _pk(out) if packed_out else out

    def windowed_or_gather(operands):
        return jax.lax.cond(in_bounds, fast, slow, operands)

    def mid_or_windowed(operands):
        # trained OffsetDiversity offsets land here (see _MID_BOUND): the
        # mid cblock tier scans 2*12+2 tap rows vs the windowed kernel's
        # 43, with the tiny tier's 8-units-per-gather layout
        return jax.lax.cond(
            mid,
            lambda ops: _grouped_warp_pallas_cblock(ops[0], ops[1], ops[2],
                                                    ops[3], group_num,
                                                    _MID_BOUND, _MID_D_V,
                                                    d_h,
                                                    packed_out=packed_out),
            windowed_or_gather,
            operands)

    return jax.lax.cond(
        tiny,
        lambda ops: _grouped_warp_pallas_cblock(ops[0], ops[1], ops[2],
                                                ops[3], group_num,
                                                _SMALL_BOUND, _SMALL_D_V,
                                                d_h,
                                                packed_out=packed_out),
        mid_or_windowed,
        (x, flow_x, flow_y, mask))
