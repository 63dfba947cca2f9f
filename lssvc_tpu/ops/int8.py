"""Integer (int8) convolution building blocks — the start of the
DCVC-FM-style integer-ized inference path.

Two reasons this path exists (docs/PERFORMANCE.md §north-star):

1. **Throughput**: v5e's MXU runs s8 x s8 -> s32 at 2x the bf16 peak
   (394 vs 197 TOPS), and the conv stacks already measure ~1.2x their
   bf16 MXU-utilization floor — integer arithmetic is the one remaining
   on-chip multiplier for the conv-bound fraction of the frame.
2. **Cross-machine stream portability**: float entropy-model arithmetic
   makes real bitstreams machine/compiler-dependent (the reference
   shares this caveat); integer arithmetic in the probability path is
   the known fix (DCVC-FM).  These kernels are the compute half; the
   entropy-model half reuses them once per-stage scales are calibrated.

Quantization scheme (standard symmetric PTQ):
  x_q = clip(round(x / s_x), -127, 127)        (per-tensor activation)
  w_q = clip(round(w / s_w[o]), -127, 127)     (per-output-channel)
  y   = conv(x_q, w_q) -> s32, dequantized by s_x * s_w[o] (+ bias),
        then either returned in float or requantized to the next
        layer's s8 with a fused scale.

All functions are jit-safe and shape-static.  Scales are data, not
tracer-dependent branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.ConvDimensionNumbers(lhs_spec=(0, 3, 1, 2),
                               rhs_spec=(3, 2, 0, 1),
                               out_spec=(0, 3, 1, 2))


def quant_act(x, scale):
    """Symmetric per-tensor activation quantization -> int8."""
    q = jnp.round(x.astype(jnp.float32) / jnp.float32(scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def calib_act_scale(x, pct=99.9):
    """Host-side calibration: percentile absmax -> scale (f32 scalar)."""
    import numpy as np

    a = np.abs(np.asarray(x, np.float32)).reshape(-1)
    amax = np.percentile(a, pct) if a.size else 1.0
    return float(max(amax, 1e-8) / 127.0)


def quant_weight(w):
    """Per-output-channel symmetric weight quantization.

    w: HWIO float. Returns (w_q int8 HWIO, scale (O,) f32)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(w.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def int8_conv2d(x_q, w_q, stride=1, padding=None):
    """s8 x s8 -> s32 NHWC conv (MXU-native integer path)."""
    kh, kw = w_q.shape[0], w_q.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    if isinstance(stride, int):
        stride = (stride, stride)
    return lax.conv_general_dilated(
        x_q, w_q, window_strides=stride, padding=padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)


def dequant(acc, act_scale, w_scale, b=None):
    """s32 accumulator -> float (f32), fused scale + optional bias."""
    y = acc.astype(jnp.float32) * (jnp.float32(act_scale)
                                   * w_scale.astype(jnp.float32))
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y

def requant(acc, act_scale, w_scale, out_scale, b=None, relu=False):
    """s32 accumulator -> next layer's s8 with one fused multiplier."""
    mult = (jnp.float32(act_scale) / jnp.float32(out_scale)
            ) * w_scale.astype(jnp.float32)
    y = acc.astype(jnp.float32) * mult
    if b is not None:
        y = y + b.astype(jnp.float32) / jnp.float32(out_scale)
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def int8_conv_ref(x, w, act_scale, b=None, stride=1):
    """Float-in/float-out quantized conv (quantize -> s8 conv -> dequant).

    The correctness contract for the integer path: equal to the float
    conv up to quantization error (|err| bounded by the scales)."""
    w_q, w_scale = quant_weight(w)
    acc = int8_conv2d(quant_act(x, act_scale), w_q, stride=stride)
    return dequant(acc, act_scale, w_scale, b=b)
