"""Width-packed convolution domain — the structural fix for small-channel
full-resolution conv traffic on TPU.

Problem: XLA:TPU lays NHWC activations out channel-minor with the lane dim
padded to 128, so every full-res C=48/64 tensor carries 2.7x/2x wasted HBM
bytes — and the 1080p frame is HBM-traffic-bound (docs/PERFORMANCE.md
§deep-core-bisect: context stacks + recon + SpyNet ≈ 630 of 804 ms, all
small-channel full-res convs).

Fix: re-express the full-res stacks over a **width-packed** tensor
``(N, H, W/p, p*C)``: p horizontally-adjacent pixels stacked into the
channel dim.  Because NHWC flattens (W, C) row-major, packing is a pure
`reshape` — zero data movement at the domain boundary apart from XLA's
retiling.  A k-wide stride-s conv on the unpacked tensor is EXACTLY a
k'-wide stride-s conv on the packed tensor with a block-structured kernel
(`pack_kernel`), so any conv stack can run in the packed domain with
bit-identical results (same dot-general accumulation order per output).

Cost model (p=2, C=48): packed C=96 pads to 128 lanes (1.33x) instead of
48->128 (2.7x) and halves the row count => ~2x less HBM traffic; the dense
packed kernel has p^2 more entries with ~half zeros => ~2x the MACs, paid
on the under-utilized MXU.  Reference channel plan being attacked:
`/root/reference/src/InterModules/lssvc_modules.py:8-12` (g_ch_1x=48,
g_ch_2x=64 at full/half res).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .nn import conv2d


def pack_width(x, p: int):
    """(N, H, W, C) -> (N, H, W/p, p*C); packed channel = (w % p)*C + c.

    Pure reshape: NHWC row-major flattening of (W, C) makes the packed
    layout the SAME linear element order.
    """
    n, h, w, c = x.shape
    assert w % p == 0, (w, p)
    return x.reshape(n, h, w // p, p * c)


def unpack_width(x, p: int):
    """(N, H, Wp, p*C) -> (N, H, Wp*p, C). Inverse of `pack_width`."""
    n, h, wp, pc = x.shape
    assert pc % p == 0, (pc, p)
    return x.reshape(n, h, wp * p, pc // p)


def pack_kernel(w, p: int, stride: int = 1):
    """Packed-domain equivalent of an HWIO conv kernel.

    For a (kh, kw, Cin, Cout) kernel with odd kw, torch padding kw//2 and
    width-stride `stride`, returns (packed_w, (pad_l, pad_r)) such that

        conv2d(pack_width(x, p), packed_w, stride=(stride, stride),
               padding=((kh//2, kh//2), (pad_l, pad_r)))
        == pack_width(conv2d(x, w, stride=stride), p)

    exactly (the packed kernel scatters the original taps; untouched slots
    are zero).  Derivation: output real column x_out = p*xp_out + so reads
    input column stride*x_out + d (d in [-kw//2, kw//2]); writing
    q = stride*so + d = p*T + si places tap d of output-slot so at packed
    tap T, input-slot si.
    """
    w = np.asarray(w)
    kh, kw, cin, cout = w.shape
    assert kw % 2 == 1, kw
    r = kw // 2
    t_min = (-r) // p  # Python floor division

    t_max = (stride * (p - 1) + r) // p
    kw_p = t_max - t_min + 1
    packed = np.zeros((kh, kw_p, p * cin, p * cout), dtype=w.dtype)
    for so in range(p):
        for d in range(-r, r + 1):
            q = stride * so + d
            t = q // p  # floor division (q may be negative)
            si = q - p * t
            packed[:, t - t_min, si * cin:(si + 1) * cin,
                   so * cout:(so + 1) * cout] += w[:, d + r]
    pad_l = -t_min
    pad_r = t_max - (stride - 1)
    return packed, (pad_l, pad_r)


def pack_depthwise_kernel(w, p: int, stride: int = 1):
    """Packed equivalent of a depthwise (kh, kw, 1, C) kernel, densified.

    Returns a dense (kh, kw_p, p*C, p*C) kernel (+padding).  The densified
    kernel burns ~C x more MACs than grouped depthwise, but depthwise convs
    are ~1/C the FLOPs of the surrounding dense 3x3s, so this costs about
    half of one dense packed 3x3 — cheap against the halved HBM traffic.
    """
    w = np.asarray(w)
    kh, kw, one, c = w.shape
    assert one == 1, w.shape
    dense = np.zeros((kh, kw, c, c), dtype=w.dtype)
    idx = np.arange(c)
    dense[:, :, idx, idx] = w[:, :, 0, :]
    return pack_kernel(dense, p, stride)


def pack_bias(b, p: int):
    """(C,) bias -> (p*C,) packed bias."""
    return jnp.tile(jnp.asarray(b), (p,))


def pack_kernel_jnp(w, p: int, stride: int = 1):
    """Traceable variant of `pack_kernel` (works on jit-traced weights).

    The scatter runs on kernel-sized tensors only (a few 10-100 KB) every
    call; XLA fuses it away next to the conv.  Returns (packed_w, pad_lr).
    """
    kh, kw, cin, cout = w.shape
    assert kw % 2 == 1, kw
    r = kw // 2
    t_min = (-r) // p
    t_max = (stride * (p - 1) + r) // p
    kw_p = t_max - t_min + 1
    packed = jnp.zeros((kh, kw_p, p * cin, p * cout), dtype=w.dtype)
    for so in range(p):
        for d in range(-r, r + 1):
            q = stride * so + d
            t = q // p
            si = q - p * t
            packed = packed.at[:, t - t_min, si * cin:(si + 1) * cin,
                               so * cout:(so + 1) * cout].add(w[:, d + r])
    return packed, (-t_min, t_max - (stride - 1))


def pack_depthwise_kernel_jnp(w, p: int, stride: int = 1):
    """Traceable `pack_depthwise_kernel` (dense-ified)."""
    kh, kw, one, c = w.shape
    assert one == 1, w.shape
    idx = jnp.arange(c)
    dense = jnp.zeros((kh, kw, c, c), dtype=w.dtype)
    dense = dense.at[:, :, idx, idx].set(w[:, :, 0, :])
    return pack_kernel_jnp(dense, p, stride)


def packed_conv2d(x_packed, packed_w, b_packed=None, stride: int = 1,
                  pad_lr=(1, 1), kh: int = 3, precision=None):
    """Run a packed-domain conv (NHWC conv with explicit width padding)."""
    return conv2d(x_packed, jnp.asarray(packed_w), b_packed,
                  stride=(stride, stride),
                  padding=((kh // 2, kh // 2), pad_lr),
                  precision=precision)
