"""Core NN primitives, TPU-native (NHWC activations, HWIO kernels).

Pure functions over explicit parameter arrays — no module objects, no hidden
state.  Semantics match the corresponding torch ops used by the reference
networks (stride/padding conventions of Conv2d / ConvTranspose2d /
PixelShuffle / pooling / LeakyReLU / GDN) so pretrained torch checkpoints can
be converted weight-for-weight, but the implementation targets XLA: convs are
`lax.conv_general_dilated` in NHWC/HWIO; transposed convs are expressed as
lhs-dilated convs (one fused HLO op, MXU-tiled); GDN's channel mixing is an
einsum that XLA fuses with the surrounding elementwise work.

Reference behavior contracts: GDN `/root/reference/src/InterModules/
video_net_component.py:52-105` and `/root/reference/src/IntraModules/gdn.py`
(mathematically identical reparameterizations — a single implementation here).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Conv precision: HIGHEST gives fp32-exact results needed for bpp parity with
# the fp32 torch reference; callers can switch to DEFAULT/bf16 for speed.
_DEFAULT_CONV_PRECISION = lax.Precision.HIGHEST

# Compute dtype for conv/matmul operands. float32 (default) = exact parity;
# bfloat16 = MXU-native speed with f32 accumulation (parameters stay f32,
# activations round-trip through bf16 only at conv boundaries).
_COMPUTE_DTYPE = jnp.float32


def default_conv_precision():
    return _DEFAULT_CONV_PRECISION


def set_default_conv_precision(p):
    global _DEFAULT_CONV_PRECISION
    _DEFAULT_CONV_PRECISION = p


def set_compute_dtype(dtype):
    """'float32' for parity, 'bfloat16' for throughput."""
    global _COMPUTE_DTYPE, _DEFAULT_CONV_PRECISION
    _COMPUTE_DTYPE = jnp.dtype(dtype)
    _DEFAULT_CONV_PRECISION = (lax.Precision.HIGHEST
                               if _COMPUTE_DTYPE == jnp.float32
                               else lax.Precision.DEFAULT)


def set_precision_mode(mode: str):
    """Convenience presets:
      'fp32'  — f32 activations, 6-pass exact matmuls (reference parity)
      'high'  — f32 activations, 3-pass bf16 matmuls (near-parity, ~2x)
      'bf16'  — bf16 operands AND outputs, f32 MXU accumulation (serving
                throughput; bf16 outputs measured +15% over f32 outputs on
                the 1080p two-layer bench: 1.135 vs 0.987 fps)
      'int8'  — bf16 everywhere EXCEPT calibrated packed conv sites, which
                run s8 x s8 -> s32 on the MXU (2x bf16 peak; ops/int8.py).
                Requires a calibration table (int8.set_calibration) —
                uncalibrated sites silently keep the bf16 path.
    """
    global _DEFAULT_CONV_PRECISION
    from . import int8 as _q8

    _q8.set_int8_mode(mode == "int8")
    if mode == "fp32":
        set_compute_dtype("float32")
        set_bf16_outputs(False)
    elif mode == "high":
        set_compute_dtype("float32")
        set_bf16_outputs(False)
        _DEFAULT_CONV_PRECISION = lax.Precision.HIGH
    elif mode in ("bf16", "int8"):
        set_compute_dtype("bfloat16")
        set_bf16_outputs(True)
    else:
        raise ValueError(mode)


def apply_precision_cli(mode: str, int8_calib: str | None = None):
    """CLI entry-point preset: `set_precision_mode` plus the int8 extras.

    `--precision int8` needs a calibration table (tools/int8_calibrate.py)
    and the width-packed domain (the s8 sites live in the packed blocks);
    every other mode passes through.  Both encoder (test.py) and decoder
    (decode.py) MUST use the same table — the closed-loop stream contract
    extends to activation scales."""
    if mode == "int8":
        if not int8_calib:
            raise SystemExit(
                "--precision int8 requires --int8_calib <table.json> "
                "(produce one with tools/int8_calibrate.py)")
        import json

        from . import int8 as _q8

        with open(int8_calib) as f:
            _q8.set_calibration(json.load(f))
        set_packed_width(2)
    set_precision_mode(mode)
    # serving preset: cap OD diversity offsets into the mid warp tier
    # (identical at encoder and decoder — both run this CLI preset)
    set_od_offset_cap(float(os.environ.get("LSSVC_OD_OFFSET_CAP", "10")))


_OD_OFFSET_CAP = None


def set_od_offset_cap(v):
    """Serving-side cap on OffsetDiversity diversity offsets (px).

    Trained offset heads are tanh-bounded at max_residue_magnitude=40 but
    measured offsets concentrate at 8-11 px — a handful of saturated
    outlier pixels push the per-frame |flow| max past the mid warp tier's
    b=12 bound and send the whole grouped warp to the 43x63 windowed
    kernel (the tier dispatch keys on the global max).  Capping offsets
    at 10 px keeps offset+|mv| within the mid tier.  Encoder and decoder
    both compute offsets from decoded data, so the identical cap keeps
    streams in lockstep.  None/0 disables (training never sets it)."""
    global _OD_OFFSET_CAP
    _OD_OFFSET_CAP = float(v) if v else None


def od_offset_cap():
    return _OD_OFFSET_CAP


def compute_dtype():
    return _COMPUTE_DTYPE


def _cast_operands(x, w):
    if _COMPUTE_DTYPE != jnp.float32:
        return x.astype(_COMPUTE_DTYPE), w.astype(_COMPUTE_DTYPE)
    return x, w


_BF16_OUTPUTS = False


def set_bf16_outputs(on: bool):
    """In bf16 mode, emit conv outputs as bf16 instead of f32.

    Halves activation write/read traffic in principle, but measured SLOWER
    end-to-end on the 1080p two-layer bench (0.84 vs 0.98 fps) — the extra
    cast boundaries around f32 elementwise chains cost more than the saved
    bytes.  Kept as a switch for future re-evaluation."""
    global _BF16_OUTPUTS
    _BF16_OUTPUTS = bool(on)


def _pref_out():
    """Conv output dtype: f32 accumulation is internal to the MXU either
    way; see set_bf16_outputs."""
    if _BF16_OUTPUTS and _COMPUTE_DTYPE == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


_PACKED_WIDTH = 1


def set_packed_width(p: int):
    """p=2 routes the hot full-res stride-1 conv stacks through the
    width-packed domain (ops/packed.py: (N,H,W/2,2C) tensors, exact
    block-structured kernels) — ~2x less HBM traffic for C=48/64 full-res
    tensors.  p=1 (default) keeps the plain path; fp32 parity tests stay
    on p=1 because the packed accumulation order differs in last bits."""
    global _PACKED_WIDTH
    assert p in (1, 2), p
    _PACKED_WIDTH = int(p)


def packed_width() -> int:
    return _PACKED_WIDTH


_CONV1X1_EINSUM = False


def set_conv1x1_einsum(on: bool):
    """Route 1x1/stride-1/ungrouped convs through an einsum matmul instead
    of conv_general_dilated.  Mathematically identical; skips XLA:TPU's
    batch-1 space-to-batch conv wrappers (34 -> 25 ms on a 1080p
    DepthConvBlock stack, tools/conv_bench.py --impl mixed).  Full-model
    A/B (stable-measured, 2026-08): 1.007 vs 1.134 fps — an 11%
    REGRESSION; mixing dot and conv ops makes XLA insert layout copies
    between them that outweigh the microbench win.  Kept as an ablation
    mode (`bench.py --mode bf16_einsum`); stays off."""
    global _CONV1X1_EINSUM
    _CONV1X1_EINSUM = bool(on)


_DN = ("NHWC", "HWIO", "NHWC")


def to_nhwc(x):
    """NCHW -> NHWC."""
    return jnp.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    """NHWC -> NCHW."""
    return jnp.transpose(x, (0, 3, 1, 2))


def pad_nhwc(x, pad_lrtb, value=0.0):
    """Pad/crop W (left, right) and H (top, bottom) of an NHWC tensor.

    Accepts negative entries (crops), like torch.nn.functional.pad.
    """
    left, right, top, bottom = pad_lrtb
    if left == right == top == bottom == 0:
        return x
    crop_t = max(0, -top)
    crop_b = max(0, -bottom)
    crop_l = max(0, -left)
    crop_r = max(0, -right)
    if crop_t or crop_b or crop_l or crop_r:
        h, w = x.shape[1], x.shape[2]
        x = x[:, crop_t:h - crop_b, crop_l:w - crop_r, :]
    pt, pb, pl, pr = max(0, top), max(0, bottom), max(0, left), max(0, right)
    if pt or pb or pl or pr:
        x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)),
                    constant_values=value)
    return x


def conv2d(x, w, b=None, stride=1, padding=None, groups=1, precision=None):
    """2D convolution. x: NHWC, w: HWIO ((kh, kw, in/groups, out)).

    `padding` defaults to (k-1)//2 per axis (torch's "same-ish" convention
    for odd kernels); pass an int or ((t, b), (l, r)).
    """
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    if isinstance(stride, int):
        stride = (stride, stride)
    x, w = _cast_operands(x, w)
    prec = precision if precision is not None else _DEFAULT_CONV_PRECISION
    if (_CONV1X1_EINSUM and kh == kw == 1 and groups == 1
            and stride == (1, 1) and padding == ((0, 0), (0, 0))):
        out = jnp.einsum("bhwc,co->bhwo", x, w[0, 0], precision=prec,
                         preferred_element_type=_pref_out())
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
    out = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=prec,
        preferred_element_type=_pref_out(),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(x, w, b=None, stride=2, padding=1, output_padding=1,
                     precision=None):
    """Transposed conv with torch ConvTranspose2d semantics.

    `w` must already be converted to HWIO conv-equivalent layout
    (spatially flipped; see convert.convert_state_dict). Expressed as an
    lhs-dilated conv so XLA lowers it to a single MXU-tiled op.
    """
    kh, kw = w.shape[0], w.shape[1]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    pads = tuple(
        (k - 1 - p, k - 1 - p + op)
        for k, p, op in zip((kh, kw), padding, output_padding)
    )
    x, w = _cast_operands(x, w)
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_DN,
        precision=precision if precision is not None else _DEFAULT_CONV_PRECISION,
        preferred_element_type=_pref_out(),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def pixel_shuffle(x, r: int):
    """Sub-pixel upsample (torch PixelShuffle) on NHWC: C*r^2 -> C, HxW -> rHxrW."""
    n, h, w, c = x.shape
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, h * r, w * r, oc)


def avg_pool2d(x, k: int = 2, stride: int | None = None):
    stride = stride or k
    out = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return out / (k * k)


def max_pool2d(x, k: int = 2, stride: int | None = None):
    stride = stride or k
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def ste_round(x):
    """round() with a straight-through gradient.

    Forward-identical to jnp.round; backward passes gradients through
    unchanged (the reference's `quant`/`d_quant` STE, `dmc_net.py:408-414`,
    `img_entropy_models.py:365-371`).  Used for all latent quantization so
    the same forward serves eval and training.
    """
    return x + lax.stop_gradient(jnp.round(x) - x)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# GDN

_REPARAM_OFFSET = 2.0 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2
_BETA_MIN = 1e-6
_BETA_BOUND = (_BETA_MIN + _PEDESTAL) ** 0.5
_GAMMA_BOUND = _REPARAM_OFFSET


def gdn(x, beta, gamma, inverse: bool = False, precision=None):
    """Generalized divisive normalization over NHWC channels.

    beta: (C,) raw parameter, gamma: (C_out, C_in) raw parameter — both in the
    sqrt-reparameterized space the torch models store
    (`video_net_component.py:83-105`).  norm = sqrt(x^2 @ gamma^T + beta);
    out = x * norm (inverse) or x / norm.
    """
    beta = jnp.square(jnp.maximum(beta, _BETA_BOUND)) - _PEDESTAL
    gamma = jnp.square(jnp.maximum(gamma, _GAMMA_BOUND)) - _PEDESTAL
    norm = jnp.einsum(
        "nhwc,dc->nhwd", jnp.square(x), gamma,
        precision=precision if precision is not None else _DEFAULT_CONV_PRECISION,
    ) + beta
    if inverse:
        return x * jnp.sqrt(norm)
    return x * lax.rsqrt(norm)
