"""Fused conv-chain Pallas kernel for full-resolution small-channel stacks.

Motivation (docs/PERFORMANCE.md §deep-core-bisect): the 1080p frame is
dominated by chains of 3x3 convs at C=48/64/96 whose XLA lowering pays
space-to-batch rewrites, per-op layout (re)tiling, and two HBM round trips
per conv.  This kernel runs an entire chain strip-by-strip in VMEM:

  - one HBM read of the input strip (+ halo rows) and one HBM write of the
    final output per strip — intermediates never touch HBM;
  - each 3x3 conv is ONE MXU matmul: the 9 taps are gathered into the
    contraction dim (A_cat: (rows*Wb, 9*Cin) x (9*Cin, Cout)) built from
    free leading-dim row slices and sublane rotations;
  - per-layer zero-padding semantics are preserved exactly by re-zeroing
    the halo ring after every layer, so chained results match the unfused
    ops' math (f32 exact; bf16 mode differs only in inter-layer rounding
    points, same as the packed domain).

Every layer owns a dedicated VMEM scratch buffer with its exact channel
count (Mosaic cannot lane-slice non-128-aligned views, and per-layer
buffers also make residual adds free — `add_saved` just reads the saved
layer's buffer).

Reference counterpart being accelerated: the context/fusion/recon conv
stacks of `/root/reference/src/InterModules/lssvc_modules.py:157-336`.

Chain format — list of layer specs:
  {"kind": "conv3", "w": (3,3,Ci,Co), "b": (Co,)|None, "slope": float|None}
  {"kind": "conv1", "w": (1,1,Ci,Co), ...}          1x1 conv
  {"kind": "dw3",   "w": (3,3,1,C),  ...}           depthwise 3x3 (VPU)
  {"kind": "act",   "slope": float}                  standalone leaky relu
  {"kind": "save"}                                   mark residual source
  {"kind": "add_saved"}                              add last-saved tensor
`save`/`add_saved` cover ResBlock / DepthConvBlock residual spans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_x(a, shift):
    """Rotate along the width (sublane) axis of (R, Wb, C).  Wrapped values
    land in the halo ring, which is re-zeroed after every layer."""
    if shift == 0:
        return a
    wb = a.shape[1]
    return pltpu.roll(a, shift % wb, axis=1)


def _pad_lanes(a, cpad):
    """Zero-pad the channel (lane) dim of a value to the buffer width."""
    c = a.shape[-1]
    if c == cpad:
        return a
    return jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, cpad - c),))


def _chain_kernel(x_ref, *refs, ops, cs, tr, L, h, w, wb, n_w, n_buf,
                  cdtype):
    # DMA-facing buffers keep lane dims padded to 128 multiples (Mosaic
    # cannot slice/copy non-tile-aligned lane extents); the true channel
    # counts `cs` are applied with value-level slices.
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    out_ref = refs[2 * n_w]
    bufs = refs[2 * n_w + 1:2 * n_w + 1 + n_buf]
    sem = refs[-1]

    i = pl.program_id(0)
    R = tr + 2 * L

    copy = pltpu.make_async_copy(x_ref.at[pl.ds(i * tr, R)], bufs[0], sem)
    copy.start()
    copy.wait()

    def mask_valid(acc2, r0):
        # emulate each conv's zero-pad ring: zero everything outside the
        # true image so the next layer sees exact zeros there.  acc2 is
        # (n_out*wb, cout); the mask is a function of the sublane index.
        m = jax.lax.broadcasted_iota(jnp.int32, acc2.shape, 0)
        col = m % wb
        grow = i * tr - L + r0 + m // wb
        valid = (col >= L) & (col < L + w) & (grow >= 0) & (grow < h)
        return jnp.where(valid, acc2, jnp.zeros((), acc2.dtype))

    # ops: (kind, wi, slope, src, dst, saved, depth_in)
    for kind, wi, slope, src_i, dst_i, saved_i, depth in ops:
        cur = bufs[src_i]
        cin, cout = cs[src_i], cs[dst_i]
        cpad = bufs[dst_i].shape[-1]
        spatial = kind in ("conv3", "dw3")
        if spatial:
            n_out = R - 2 * (depth + 1)
            r0 = depth + 1
            src = cur[depth:depth + n_out + 2][..., :cin]
        else:
            n_out = R - 2 * depth
            r0 = depth
            src = cur[r0:r0 + n_out][..., :cin]

        if kind == "add_saved":
            sv = bufs[saved_i][r0:r0 + n_out][..., :cin]
            bufs[dst_i][r0:r0 + n_out] = _pad_lanes(src + sv, cpad)
            continue
        if kind == "act":
            a = src.astype(jnp.float32)
            a = jnp.where(a >= 0, a, a * slope)
            bufs[dst_i][r0:r0 + n_out] = _pad_lanes(a.astype(cdtype), cpad)
            continue

        if kind == "conv3":
            parts = []
            for dy in range(3):
                sl = src[dy:dy + n_out]
                for dx in range(3):
                    parts.append(_shift_x(sl, 1 - dx))
            a = jnp.concatenate(parts, axis=2).reshape(n_out * wb, 9 * cin)
            acc = jax.lax.dot_general(
                a, w_refs[wi][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif kind == "conv1":
            a = src.reshape(n_out * wb, cin)
            acc = jax.lax.dot_general(
                a, w_refs[wi][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:  # dw3: 9 broadcast fmas on the VPU
            wk = w_refs[wi][:].astype(jnp.float32)  # (9, C)
            acc3 = jnp.zeros((n_out, wb, cout), jnp.float32)
            t = 0
            for dy in range(3):
                sl = src[dy:dy + n_out]
                for dx in range(3):
                    acc3 = acc3 + (_shift_x(sl, 1 - dx).astype(jnp.float32)
                                   * wk[t][None, None, :])
                    t += 1
            acc = acc3.reshape(n_out * wb, cout)

        acc = acc + b_refs[wi][:].astype(jnp.float32)
        if slope is not None:
            acc = jnp.where(acc >= 0, acc, acc * slope)
        acc = mask_valid(acc, r0)
        bufs[dst_i][r0:r0 + n_out] = _pad_lanes(
            acc.reshape(n_out, wb, cout).astype(cdtype), cpad)

    out_ref[...] = bufs[ops[-1][4]][L:L + tr]


def _cpad(c):
    return -(-c // 128) * 128


@functools.partial(jax.jit, static_argnums=(2,))
def _conv_chain_call(x, flat_args, static):
    (ops, buf_cs, tr, L, h, w, wb, hp, cdtype_name) = static
    cdtype = jnp.dtype(cdtype_name)
    ws, bs = flat_args
    n_w = len(ws)
    n_buf = len(buf_cs)
    c_last = buf_cs[ops[-1][4]]
    cp_last = _cpad(c_last)

    xp = x[0].astype(cdtype)
    xp = jnp.pad(xp, ((L, hp - h + L), (L, wb - w - L),
                      (0, _cpad(buf_cs[0]) - buf_cs[0])))

    R = tr + 2 * L
    grid = (hp // tr,)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_chain_kernel, ops=ops, cs=buf_cs, tr=tr, L=L,
                          h=h, w=w, wb=wb, n_w=n_w, n_buf=n_buf,
                          cdtype=cdtype),
        out_shape=jax.ShapeDtypeStruct((hp, wb, cp_last), cdtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for a in ws]
        + [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                        memory_space=pltpu.VMEM) for a in bs],
        out_specs=pl.BlockSpec((tr, wb, cp_last), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, wb, _cpad(c)), cdtype)
                        for c in buf_cs]
        + [pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xp, *ws, *bs)
    return out[None, :h, L:L + w, :c_last]


def _prep_weight(kind, w, cdtype):
    w = np.asarray(w) if not isinstance(w, jnp.ndarray) else w
    if kind == "conv3":
        kh, kw, ci, co = w.shape
        assert (kh, kw) == (3, 3), w.shape
        return jnp.asarray(w, cdtype).reshape(9 * ci, co)
    if kind == "conv1":
        assert w.shape[:2] == (1, 1), w.shape
        return jnp.asarray(w, cdtype)[0, 0]
    assert w.shape[:2] == (3, 3) and w.shape[2] == 1, w.shape
    return jnp.asarray(w, cdtype)[:, :, 0, :].reshape(9, -1)


def conv_chain_specs(x, specs, cdtype=None, tr=None):
    """Run a layer-spec chain over (N, H, W, C) NHWC input."""
    n, h, w, c0 = x.shape
    if n > 1:
        return jnp.concatenate(
            [conv_chain_specs(x[i:i + 1], specs, cdtype=cdtype, tr=tr)
             for i in range(n)], axis=0)
    if cdtype is None:
        cdtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    cdtype = jnp.dtype(cdtype)

    ops = []          # (kind, wi, slope, src, dst, saved, depth_in)
    buf_cs = [c0]     # channel count per scratch buffer
    ws, bs = [], []
    cur_buf = 0
    saved = {}        # tag -> buffer index (None key = untagged save)
    depth = 0
    for s in specs:
        kind = s["kind"]
        if kind == "save":
            saved[s.get("tag")] = cur_buf
            continue
        if kind == "add_saved":
            sv = saved[s.get("tag")]
            assert buf_cs[sv] == buf_cs[cur_buf]
            buf_cs.append(buf_cs[cur_buf])
            ops.append((kind, None, None, cur_buf, len(buf_cs) - 1,
                        sv, depth))
            cur_buf = len(buf_cs) - 1
            continue
        if kind == "act":
            buf_cs.append(buf_cs[cur_buf])
            ops.append((kind, None, s["slope"], cur_buf, len(buf_cs) - 1,
                        None, depth))
            cur_buf = len(buf_cs) - 1
            continue
        pw = _prep_weight(kind, s["w"], cdtype)
        co = pw.shape[-1]
        wi = len(ws)
        ws.append(pw)
        b = s.get("b")
        bs.append(jnp.asarray(b, jnp.float32).reshape(1, co)
                  if b is not None else jnp.zeros((1, co), jnp.float32))
        buf_cs.append(co)
        ops.append((kind, wi, s.get("slope"), cur_buf, len(buf_cs) - 1,
                    None, depth))
        if s.get("branch"):
            # side branch (e.g. a DepthConv adaptor): result is stored
            # under the tag, the main path continues from the previous buf
            saved[s["branch"]] = len(buf_cs) - 1
        else:
            cur_buf = len(buf_cs) - 1
        if kind in ("conv3", "dw3"):
            depth += 1
    L = max(depth, 1)

    if tr is None:
        # scratch is one 128-lane-padded buffer per layer: keep the strip
        # short so (L+1) buffers + the A_cat matmul operand fit in VMEM
        tr = 8
    wb = -(-(w + 2 * L) // 8) * 8
    hp = -(-h // tr) * tr

    static = (tuple(ops), tuple(buf_cs), tr, L, h, w, wb, hp, str(cdtype))
    return _conv_chain_call(x, (tuple(ws), tuple(bs)), static)


def conv_chain(x, weights, biases=None, slopes=None, cdtype=None, tr=None):
    """Convenience wrapper: uniform 3x3 chain.  weights[l]: (3,3,Ci,Co)."""
    L = len(weights)
    if biases is None:
        biases = [None] * L
    if slopes is None:
        slopes = [None] * L
    specs = [{"kind": "conv3", "w": w, "b": b, "slope": s}
             for w, b, s in zip(weights, biases, slopes)]
    return conv_chain_specs(x, specs, cdtype=cdtype, tr=tr)
