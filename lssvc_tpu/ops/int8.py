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


def fixed_point_multiplier(act_scale, w_scale, out_scale,
                           w_q=None, mult_bits=15):
    """Host-side: fold (act_scale * w_scale / out_scale) into an integer
    multiply+shift triple for an all-integer requant (DCVC-FM style).

    The requant computes
        y = clamp(((acc >>r acc_shift) * M) >>r post)         (>>r rounds)
    entirely in s32.  `acc_shift` is chosen per output channel from the
    worst-case accumulator bound B = 127 * sum|w_q| so that
    B/2^acc_shift * M < 2^31 — channels with small weights keep more
    accumulator precision than a global worst-case shift would allow.
    `post` is chosen per channel so M uses its full mult_bits.

    Returns (M, post, acc_shift) as s32 numpy arrays of shape (O,).
    """
    import numpy as np

    m = (np.float64(act_scale) * np.asarray(w_scale, np.float64)
         / np.float64(out_scale))
    m = np.atleast_1d(m)
    if w_q is not None:  # per-channel accumulator bound, HWIO
        B = 127.0 * np.abs(np.asarray(w_q, np.float64)).sum(axis=(0, 1, 2))
        B = np.broadcast_to(np.atleast_1d(B), m.shape)
    else:  # global worst case: 3x3x192 full-scale taps
        B = np.full(m.shape, 127.0 * 127 * 3 * 3 * 192)
    acc_bits = np.ceil(np.log2(np.maximum(B, 1.0))).astype(np.int32)
    acc_shift = np.maximum(acc_bits + mult_bits - 31, 0).astype(np.int32)
    post = np.zeros(m.shape, np.int32)
    M = np.zeros(m.shape, np.int64)
    for i, mi in enumerate(m):
        if mi <= 0:
            continue
        e = int(np.floor(np.log2(mi)))
        # M = m * 2^(post + acc_shift), M in [2^(mult_bits-1), 2^mult_bits)
        p = mult_bits - 1 - e - int(acc_shift[i])
        Mi = int(round(mi * 2.0 ** (p + int(acc_shift[i]))))
        if Mi >= 2 ** mult_bits:  # rounding carried into the next octave
            Mi >>= 1
            p -= 1
        M[i], post[i] = Mi, p
    # jnp right-shift with negative counts is undefined; clamp post >= 0
    # (post < 0 would mean m >= 2^(mult_bits-1) / B — absurd for real nets)
    post = np.maximum(post, 0)
    # s32 shifts with count >= 31 (and the `1 << post` rounding term at
    # post >= 31) are likewise undefined: a negligible multiplier from a
    # dead/near-zero channel (e.g. w_scale ~ 1e-8) yields post > 30.
    # Fold the excess into M, which underflows toward 0 — the correct
    # limit (the channel's requant output is ~0, not clamped garbage).
    excess = np.maximum(post - 30, 0)
    if excess.any():
        M = M >> excess
        post = post - excess
    return M.astype(np.int32), post.astype(np.int32), acc_shift


def requant_fixed(acc, M, post, acc_shift, relu=False):
    """All-integer s32 -> s8 requant: rounding shift, per-channel multiply,
    rounding shift, clamp.  No f32 round/scale pass — fuses into the conv
    epilogue the way the plain-shift variant does (measured: f32 requant
    costs ~0.8 ms/layer at 1080p-packed; integer shift ~0.0,
    tools/int8_bench.py)."""
    half = (jnp.int32(1) << acc_shift) >> 1  # 0 when acc_shift == 0
    y = ((acc + half) >> acc_shift) * M  # s32, within range by construction
    y = (y + ((jnp.int32(1) << post) >> 1)) >> post  # round-half-up
    if relu:
        y = jnp.maximum(y, 0)
    return jnp.clip(y, -127, 127).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Serving-path integration: calibration registry + trace-time recording.
#
# The packed conv blocks (models/packed_blocks.py) consult this registry at
# TRACE time: a conv site whose scope prefix has a calibrated activation
# scale runs the s8 x s8 -> s32 MXU path (w8a8 with float glue: quantize the
# bf16 input, integer conv, dequantize + bias in the conv epilogue); sites
# without a scale keep the float path.  Scales are Python floats baked into
# the executable as constants — no tracer-dependent control flow.
#
# Calibration records absmax per conv input INSIDE a jitted stats forward:
# `with recording(stats): forward(...)` at trace time collects one scalar
# tracer per site, which the wrapper returns as an output dict.  absmax (not
# a percentile) keeps the record O(n) and fuses into the surrounding graph;
# the table builder applies the safety margin.

_CALIB: dict = {}          # scope prefix -> activation scale (float)
_INT8_MODE = False         # toggled by ops.nn.set_precision_mode("int8_*")
_RECORDING = None          # dict collecting absmax tracers during a trace


def set_int8_mode(on: bool):
    global _INT8_MODE
    _INT8_MODE = bool(on)


def int8_mode() -> bool:
    return _INT8_MODE


def set_calibration(table: dict):
    """Install scope-prefix -> activation-scale table (floats)."""
    _CALIB.clear()
    _CALIB.update(table)


def calibration() -> dict:
    return dict(_CALIB)


_SERVED: set = set()  # prefixes actually routed to the int8 path at trace


def scale_for(prefix: str):
    """Activation scale for a conv site, or None for the float path."""
    if not _INT8_MODE:
        return None
    s = _CALIB.get(prefix)
    if s is not None:
        _SERVED.add(prefix)
    return s


def served_sites() -> set:
    """Conv sites that took the int8 path in traces so far (diagnostics)."""
    return set(_SERVED)


class recording:
    """Context manager: collect per-site absmax tracers during a trace.

    Usage (inside the function being jitted):
        stats = {}
        with recording(stats):
            out = forward(...)
        return out, stats        # prefix -> scalar absmax
    """

    def __init__(self, out: dict):
        self.out = out

    def __enter__(self):
        global _RECORDING
        assert _RECORDING is None, "nested calibration recording"
        _RECORDING = self.out
        return self.out

    def __exit__(self, *exc):
        global _RECORDING
        _RECORDING = None
        return False


def maybe_record(prefix: str, x):
    """Called by conv sites; no-op unless inside `recording`."""
    if _RECORDING is not None:
        a = jnp.max(jnp.abs(x.astype(jnp.float32)))
        prev = _RECORDING.get(prefix)
        _RECORDING[prefix] = a if prev is None else jnp.maximum(prev, a)


def table_from_stats(stats: dict, margin: float = 1.0) -> dict:
    """absmax stats (device scalars or floats) -> calibration table."""
    import numpy as np

    return {k: float(max(np.float64(v) * margin, 1e-8)) / 127.0
            for k, v in stats.items()}


def int8_conv_ref(x, w, act_scale, b=None, stride=1):
    """Float-in/float-out quantized conv (quantize -> s8 conv -> dequant).

    The correctness contract for the integer path: equal to the float
    conv up to quantization error (|err| bounded by the scales)."""
    w_q, w_scale = quant_weight(w)
    acc = int8_conv2d(quant_act(x, act_scale), w_q, stride=stride)
    return dequant(acc, act_scale, w_scale, b=b)
