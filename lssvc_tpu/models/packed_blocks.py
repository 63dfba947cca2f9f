"""Width-packed variants of the hot full-resolution conv blocks.

Mirrors of `components.py` blocks that operate on width-packed tensors
(`ops/packed.py`: (N, H, W/p, p*C) — p adjacent pixels in the channel dim)
so full-res C=48/64 stacks stop paying the 2.7x/2x channel-minor lane
padding on every HBM round-trip.  Kernel packing is exact (same linear
map), so these are drop-in replacements inside a
`pack_width -> blocks -> unpack_width` region; enabled per call site via
`ops.nn.packed_width()` (serving modes), off in fp32 parity mode where
bit-stability of accumulation order matters.

Measured at 1080p bf16 (tools/packbench.py): 3x3 conv stacks 1.59x faster
at C=48, 1.17x at C=64; C>=96 regresses (already lane-full) so only 1x/2x
scale stacks route here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import leaky_relu
from ..ops import int8 as q8
from ..ops.nn import conv2d
from ..ops.packed import (
    pack_bias,
    pack_depthwise_kernel_jnp,
    pack_kernel_jnp,
    pack_width,
    unpack_width,
)

P = 2  # pack factor: doubles the channel dim, halves rows


def _pconv_int8(scope, x_pk, w, s_in, stride, p, pack_fn, bkey="bias"):
    """w8a8 integer conv with float glue (docs/PERFORMANCE.md §north-star):
    quantize the input per-tensor, quantize the kernel per-output-channel,
    run the s8 x s8 -> s32 MXU conv, dequantize + bias in the epilogue.
    The quantize/dequantize passes are elementwise and fuse; the MXU runs
    at its 2x integer peak.  Weight quant + packing are kernel-sized ops
    (XLA hoists them next to the conv; negligible at frame shapes)."""
    from ..ops.int8 import int8_conv2d, quant_act, quant_weight

    w8, w_scale = quant_weight(w)
    pw8, (pl, pr) = pack_fn(w8, p, stride)
    kh = w.shape[0]
    acc = int8_conv2d(quant_act(x_pk, s_in), pw8, stride=(stride, stride),
                      padding=((kh // 2, kh // 2), (pl, pr)))
    mult = jnp.float32(s_in) * jnp.tile(w_scale, p)
    y = acc.astype(jnp.float32) * mult + pack_bias(scope(bkey), p)
    from ..ops.nn import _pref_out

    return y.astype(_pref_out())


def _calib_key(prefix: str, w) -> str:
    """Calibration key: scope prefix + unpacked kernel channel shape.

    IntraSS and LSSVC share 24 scope prefixes (texture_extractor.*,
    context_fusion_net.*) but every shared PACKED site differs in channel
    widths (video 48ch vs intra 64ch), so the shape suffix disambiguates
    the flat global table without threading a model namespace through
    every forward (tests/test_int8.py::test_calib_keys_disambiguate)."""
    return f"{prefix}{w.shape[2]}x{w.shape[3]}"


def pconv(scope, x_pk, stride: int = 1, p: int = P, in_perm=None):
    """Packed conv from a weight/bias scope (stride 1 or 2, odd kernels).

    `in_perm` (optional int array, len p*Cin): the caller's packed input
    channel j carries what the standard packed layout calls channel
    in_perm[j] — the packed kernel's input dim is gathered accordingly at
    trace time (free: XLA folds it into the weight constant).  Lets a
    consumer read a concat of independently-packed tensors without a
    full-res relayout into the canonical interleaved order."""
    w = scope("weight")
    key = _calib_key(scope.prefix, w)
    q8.maybe_record(key, x_pk)
    s_in = q8.scale_for(key)
    if s_in is not None:
        pack_fn = pack_kernel_jnp
        if in_perm is not None:
            def pack_fn(w8, p_, stride_):
                pw8, pads = pack_kernel_jnp(w8, p_, stride_)
                return pw8[:, :, in_perm, :], pads
        return _pconv_int8(scope, x_pk, w, s_in, stride, p, pack_fn)
    pw, (pl, pr) = pack_kernel_jnp(w, p, stride)
    if in_perm is not None:
        pw = pw[:, :, in_perm, :]
    kh = w.shape[0]
    return conv2d(x_pk, pw, pack_bias(scope("bias"), p),
                  stride=(stride, stride),
                  padding=((kh // 2, kh // 2), (pl, pr)))


def pconv_dw(scope, x_pk):
    """Packed depthwise 3x3 (dense-ified; see pack_depthwise_kernel)."""
    w = scope("depth_conv.weight")
    key = _calib_key(scope.prefix + "depth_conv.", w)
    q8.maybe_record(key, x_pk)
    s_in = q8.scale_for(key)
    if s_in is not None:
        return _pconv_int8(scope, x_pk, w, s_in, 1, P,
                           pack_depthwise_kernel_jnp,
                           bkey="depth_conv.bias")
    pw, (pl, pr) = pack_depthwise_kernel_jnp(w, P, 1)
    return conv2d(x_pk, pw, pack_bias(scope("depth_conv.bias"), P),
                  padding=((1, 1), (pl, pr)))


def p_res_block(scope, x_pk, slope=0.01, start_from_relu=True,
                end_with_relu=False):
    out = leaky_relu(x_pk, slope) if start_from_relu else x_pk
    out = pconv(scope.sub("conv1"), out)
    out = leaky_relu(out, slope)
    out = pconv(scope.sub("conv2"), out)
    if end_with_relu:
        out = leaky_relu(out, slope)
    return x_pk + out


def p_depth_conv(scope, x_pk, slope=0.01):
    if "adaptor.weight" in scope:
        identity = pconv(scope.sub("adaptor"), x_pk)
    else:
        identity = x_pk
    out = pconv(scope.sub("conv1.0"), x_pk)
    out = leaky_relu(out, slope)
    out = pconv_dw(scope, out)
    out = pconv(scope.sub("conv2"), out)
    return out + identity


def p_conv_ffn(scope, x_pk, slope=0.1):
    out = pconv(scope.sub("conv.0"), x_pk)
    out = leaky_relu(out, slope)
    out = pconv(scope.sub("conv.2"), out)
    out = leaky_relu(out, slope)
    return x_pk + out


def p_depth_conv_block(scope, x_pk, slope_depth_conv=0.01, slope_ffn=0.1):
    x_pk = p_depth_conv(scope.sub("block.0"), x_pk, slope=slope_depth_conv)
    return p_conv_ffn(scope.sub("block.1"), x_pk, slope=slope_ffn)


def p_conv_seq3(scope, x_pk):
    f = pconv(scope.sub("0"), x_pk)
    f = leaky_relu(f, 0.01)
    return pconv(scope.sub("2"), f)


def packed_region(x, fn):
    """pack -> fn -> unpack around a stride-1 full-res stack."""
    return unpack_width(fn(pack_width(x, P)), P)
