"""Integer (int8) conv building blocks (`ops/int8.py`) — correctness of
the quantize -> s8 x s8 -> s32 -> dequant/requant contract that the
integer-inference path builds on (docs/PERFORMANCE.md §north-star)."""

import numpy as np

import jax.numpy as jnp

from lssvc_tpu.ops.int8 import (calib_act_scale, dequant, int8_conv2d,
                                int8_conv_ref, quant_act, quant_weight,
                                requant)
from lssvc_tpu.ops.nn import conv2d


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


def test_int8_conv_matches_integer_reference():
    """The s8 conv must be EXACT integer arithmetic (s32 accumulation):
    compare against a numpy int32 convolution."""
    x = _rand((1, 10, 12, 8), 0)
    w = _rand((3, 3, 8, 16), 1, 0.2)
    xq = np.asarray(quant_act(x, 0.02), np.int32)
    wq, _ = quant_weight(w)
    wqn = np.asarray(wq, np.int32)
    out = np.asarray(int8_conv2d(jnp.asarray(xq, jnp.int8), wq))
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    expect = np.zeros((1, 10, 12, 16), np.int32)
    for dy in range(3):
        for dx in range(3):
            expect += np.einsum("bhwc,co->bhwo",
                                xp[:, dy:dy + 10, dx:dx + 12, :],
                                wqn[dy, dx], dtype=np.int32)
    np.testing.assert_array_equal(out, expect)


def test_quantized_conv_tracks_float_conv():
    """Float->int8->float round trip through one conv stays within the
    quantization error bound of the float conv."""
    x = _rand((1, 16, 16, 12), 2)
    w = _rand((3, 3, 12, 12), 3, 0.2)
    b = _rand((12,), 4, 0.1)
    s = calib_act_scale(x, 100.0)
    got = np.asarray(int8_conv_ref(x, w, s, b=b))
    want = np.asarray(conv2d(x, w, b))
    # error bound: per-tap quantization noise ~ s/2 accumulated over
    # 3*3*12 taps with |w| <= max; use a generous empirical bound
    assert np.max(np.abs(got - want)) < 0.1, np.max(np.abs(got - want))
    # and it must be a GOOD approximation in relative terms
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-8)
    assert rel < 0.02, rel


def test_requant_chain_is_consistent():
    """Two chained quantized convs with requant between equal the
    dequant->requant composition done separately (one fused multiplier)."""
    x = _rand((1, 8, 8, 8), 5)
    w1 = _rand((3, 3, 8, 8), 6, 0.2)
    w2 = _rand((3, 3, 8, 8), 7, 0.2)
    s0 = calib_act_scale(x, 100.0)
    w1q, s1 = quant_weight(w1)
    w2q, s2 = quant_weight(w2)
    acc1 = int8_conv2d(quant_act(x, s0), w1q)
    y1f = np.maximum(np.asarray(dequant(acc1, s0, s1)), 0.0)
    s_mid = calib_act_scale(y1f, 100.0)
    x2 = requant(acc1, s0, s1, s_mid, relu=True)
    # requant == quantize(dequant) (same rounding)
    np.testing.assert_array_equal(
        np.asarray(x2), np.asarray(quant_act(jnp.asarray(y1f), s_mid)))
    acc2 = int8_conv2d(x2, w2q)
    out = np.asarray(dequant(acc2, s_mid, s2))
    want = np.asarray(conv2d(jnp.asarray(np.maximum(
        np.asarray(conv2d(x, w1)), 0.0)), w2))
    rel = np.abs(out - want).mean() / (np.abs(want).mean() + 1e-8)
    assert rel < 0.05, rel
