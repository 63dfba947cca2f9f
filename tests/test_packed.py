"""Width-packed conv domain: exactness against the plain conv path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lssvc_tpu.ops import conv2d
from lssvc_tpu.ops.packed import (
    pack_bias,
    pack_depthwise_kernel,
    pack_kernel,
    pack_width,
    packed_conv2d,
    unpack_width,
)


@pytest.mark.parametrize("p", [2, 4])
def test_pack_unpack_roundtrip(rng, p):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 3), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_width(pack_width(x, p), p)),
                                  np.asarray(x))


def test_pack_width_element_order(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 3), dtype=np.float32))
    xp = np.asarray(pack_width(x, 2))
    # packed channel (w % p)*C + c
    np.testing.assert_array_equal(xp[0, 1, 1, 3:6], np.asarray(x)[0, 1, 3, :])
    np.testing.assert_array_equal(xp[0, 0, 0, 0:3], np.asarray(x)[0, 0, 0, :])


@pytest.mark.parametrize("p,stride,k,cin,cout", [
    (2, 1, 3, 6, 5),
    (2, 1, 5, 4, 4),
    (2, 1, 7, 3, 8),
    (2, 2, 3, 6, 5),
    (2, 2, 5, 4, 4),
    (4, 1, 3, 3, 6),
    (4, 2, 3, 3, 6),
])
def test_packed_conv_exact(rng, p, stride, k, cin, cout):
    h, w = 8, 16 if (16 // stride) % p == 0 else 32
    x = jnp.asarray(rng.standard_normal((1, h, w, cin), dtype=np.float32))
    kern = jnp.asarray(
        rng.standard_normal((k, k, cin, cout), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(cout, dtype=np.float32))

    ref = conv2d(x, kern, bias, stride=stride)
    pw, pad = pack_kernel(kern, p, stride)
    got = unpack_width(
        packed_conv2d(pack_width(x, p), pw, pack_bias(bias, p),
                      stride=stride, pad_lr=pad, kh=k), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_depthwise_exact(rng):
    c, p = 6, 2
    x = jnp.asarray(rng.standard_normal((1, 8, 16, c), dtype=np.float32))
    kern = jnp.asarray(rng.standard_normal((3, 3, 1, c), dtype=np.float32))
    ref = conv2d(x, kern, groups=c)
    pw, pad = pack_depthwise_kernel(kern, p)
    got = unpack_width(packed_conv2d(pack_width(x, p), pw, pad_lr=pad), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_chain_jit(rng):
    """Packed stacks compose under jit and match an unpacked chain."""
    cin = 8
    x = jnp.asarray(rng.standard_normal((1, 8, 32, cin), dtype=np.float32))
    k1 = jnp.asarray(rng.standard_normal((3, 3, cin, cin), dtype=np.float32))
    k2 = jnp.asarray(rng.standard_normal((3, 3, cin, cin), dtype=np.float32))

    def ref_fn(x):
        y = jnp.maximum(conv2d(x, k1), 0)
        return conv2d(y, k2)

    p1, pad1 = pack_kernel(k1, 2)
    p2, pad2 = pack_kernel(k2, 2)

    @jax.jit
    def packed_fn(x):
        xp = pack_width(x, 2)
        y = jnp.maximum(packed_conv2d(xp, p1, pad_lr=pad1), 0)
        return unpack_width(packed_conv2d(y, p2, pad_lr=pad2), 2)

    np.testing.assert_allclose(np.asarray(packed_fn(x)),
                               np.asarray(jax.jit(ref_fn)(x)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_full_el_forward_close(rng):
    """Full LSSVC P-frame forward with packed_width=2 matches the plain
    path (same math, different accumulation grouping -> tiny fp32 drift)."""
    import jax.numpy as jnp

    from lssvc_tpu.models import lssvc as lssvc_model
    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.ops.nn import packed_width, set_packed_width

    params = init_lssvc(0)
    x_bl = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    x_el = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    ref_bl = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    ref_el = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))

    def run():
        return lssvc_model.forward_one_frame(
            params, x_bl, x_el, ref_bl, ref_el, None, None,
            (128, 128), 2.0, (0, 0, 0, 0))

    assert packed_width() == 1
    ref = run()
    set_packed_width(2)
    try:
        got = run()
    finally:
        set_packed_width(1)

    np.testing.assert_allclose(
        np.asarray(got["dpb"]["ref_frame_el"]),
        np.asarray(ref["dpb"]["ref_frame_el"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got["dpb"]["ref_frame_bl"]),
        np.asarray(ref["dpb"]["ref_frame_bl"]), rtol=2e-4, atol=2e-4)
    # bits are sums over quantized latents; quantization may flip a few
    # symbols under last-bit drift, so compare loosely
    assert abs(float(got["bit_el"]) - float(ref["bit_el"])) \
        <= 0.02 * abs(float(ref["bit_el"])) + 100.0
