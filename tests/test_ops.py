"""Ops parity tests: every primitive is validated against torch CPU."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from lssvc_tpu.ops import (
    conv2d, conv_transpose2d, pixel_shuffle, avg_pool2d, max_pool2d,
    leaky_relu, gdn, pad_nhwc, flow_warp, bilinear_resize,
    bilinear_upsample2, bilinear_downsample2,
)
from lssvc_tpu.convert import convert_state_dict


def t2j_nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def j2n_nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("cin,cout,k,stride,groups", [
    (8, 16, 3, 1, 1),
    (8, 16, 3, 2, 1),
    (8, 8, 1, 1, 1),
    (6, 12, 5, 1, 1),
    (8, 8, 7, 1, 1),
    (8, 16, 2, 2, 1),
    (16, 16, 3, 1, 16),  # depthwise
])
def test_conv2d_matches_torch(rng, cin, cout, k, stride, groups):
    torch.manual_seed(0)
    pad = 0 if k == 2 else (k - 1) // 2
    m = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=pad, groups=groups)
    x = torch.randn(2, cin, 12, 16)
    ref = m(x).detach().numpy()

    p = convert_state_dict(m.state_dict())
    out = conv2d(t2j_nhwc(x), p["weight"], p["bias"], stride=stride,
                 padding=pad, groups=groups)
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,k,stride,pad,opad", [
    (8, 16, 3, 2, 1, 1),
    (8, 4, 3, 1, 1, 0),
])
def test_conv_transpose2d_matches_torch(cin, cout, k, stride, pad, opad):
    torch.manual_seed(1)
    m = torch.nn.ConvTranspose2d(cin, cout, k, stride=stride, padding=pad,
                                 output_padding=opad)
    x = torch.randn(2, cin, 10, 14)
    ref = m(x).detach().numpy()

    p = convert_state_dict(m.state_dict(), transposed_keys={"weight"})
    out = conv_transpose2d(t2j_nhwc(x), p["weight"], p["bias"], stride=stride,
                           padding=pad, output_padding=opad)
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_shuffle(r):
    torch.manual_seed(2)
    x = torch.randn(2, 4 * r * r, 6, 5)
    ref = TF.pixel_shuffle(x, r).numpy()
    out = pixel_shuffle(t2j_nhwc(x), r)
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=1e-6)


def test_pooling():
    torch.manual_seed(3)
    x = torch.randn(2, 4, 8, 10)
    np.testing.assert_allclose(
        j2n_nchw(avg_pool2d(t2j_nhwc(x), 2)),
        TF.avg_pool2d(x, 2, 2).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        j2n_nchw(max_pool2d(t2j_nhwc(x), 2)),
        TF.max_pool2d(x, 2, 2).numpy(), atol=1e-6)


def test_leaky_relu():
    x = torch.randn(100)
    for slope in (0.01, 0.1, 0.2):
        np.testing.assert_allclose(
            np.asarray(leaky_relu(jnp.asarray(x.numpy()), slope)),
            TF.leaky_relu(x, slope).numpy(), atol=1e-7)


def test_pad_nhwc_matches_torch_pad():
    x = torch.randn(1, 3, 8, 9)
    for spec in [(0, 3, 0, 5), (1, 2, 3, 4), (-1, -2, -1, 0), (0, 0, 0, 0)]:
        ref = TF.pad(x, spec).numpy()
        out = pad_nhwc(t2j_nhwc(x), spec)
        np.testing.assert_allclose(j2n_nchw(out), ref, atol=1e-7)


def _torch_gdn(x, beta, gamma, inverse):
    # direct transcription of the reference GDN math for oracle purposes
    pedestal = (2 ** -18) ** 2
    beta_bound = (1e-6 + pedestal) ** 0.5
    gamma_bound = 2 ** -18
    ch = x.shape[1]
    b = torch.clamp(beta, min=beta_bound) ** 2 - pedestal
    g = (torch.clamp(gamma, min=gamma_bound) ** 2 - pedestal).view(ch, ch, 1, 1)
    norm = torch.sqrt(TF.conv2d(x ** 2, g, b))
    return x * norm if inverse else x / norm


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn(inverse):
    torch.manual_seed(4)
    ch = 16
    beta = torch.rand(ch) + 0.5
    gamma = torch.rand(ch, ch) * 0.1
    x = torch.randn(2, ch, 6, 7)
    ref = _torch_gdn(x, beta, gamma, inverse).numpy()
    out = gdn(t2j_nhwc(x), jnp.asarray(beta.numpy()), jnp.asarray(gamma.numpy()),
              inverse=inverse)
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=2e-5, rtol=1e-4)


def _torch_flow_warp(feature, flow):
    # reference torch_warp semantics (video_net_component.py:329-347)
    N, _, H, W = flow.size()
    tensor_hor = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(N, -1, H, -1)
    tensor_ver = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(N, -1, -1, W)
    grid = torch.cat([tensor_hor, tensor_ver], 1)
    flow = torch.cat([flow[:, 0:1] / ((W - 1.0) / 2.0),
                      flow[:, 1:2] / ((H - 1.0) / 2.0)], 1)
    g = (grid + flow).permute(0, 2, 3, 1)
    return TF.grid_sample(feature, g, mode="bilinear", padding_mode="border",
                          align_corners=True)


def test_flow_warp_matches_grid_sample():
    torch.manual_seed(5)
    x = torch.randn(2, 5, 12, 16)
    flow = torch.randn(2, 2, 12, 16) * 3.0
    ref = _torch_flow_warp(x, flow).numpy()
    out = flow_warp(t2j_nhwc(x), t2j_nhwc(flow))
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=2e-5, rtol=1e-4)


def test_flow_warp_large_flow_border():
    torch.manual_seed(6)
    x = torch.randn(1, 3, 8, 8)
    flow = torch.randn(1, 2, 8, 8) * 20.0  # mostly out of bounds
    ref = _torch_flow_warp(x, flow).numpy()
    out = flow_warp(t2j_nhwc(x), t2j_nhwc(flow))
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=2e-5, rtol=1e-4)


def test_clamp_flow_exact_and_finite():
    """clamp_flow is bit-exact under border warp semantics and saturates
    non-finite components (round-4 trained ckpt emitted ~3e11 px flows)."""
    from lssvc_tpu.ops.warp import clamp_flow

    rng = np.random.default_rng(17)
    h, w = 10, 14
    x = jnp.asarray(rng.normal(size=(1, h, w, 4)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(1, h, w, 2)).astype(np.float32) * 3)
    # exploded + non-finite components
    flow = flow.at[0, 2, 3, 0].set(3e11)
    flow = flow.at[0, 4, 5, 1].set(-2.9e11)
    flow = flow.at[0, 6, 7, 0].set(np.inf)
    flow = flow.at[0, 1, 1, 1].set(np.nan)
    clamped = clamp_flow(flow, h, w)
    assert np.all(np.isfinite(np.asarray(clamped)))
    assert np.asarray(jnp.max(jnp.abs(clamped[..., 0]))) <= w
    assert np.asarray(jnp.max(jnp.abs(clamped[..., 1]))) <= h
    # exactness: warp(clamped) == warp(raw) wherever raw was finite.
    # (NaN taps are undefined in the raw warp, so compare on a NaN-free
    # copy with only the exploded-but-finite components.)
    flow_f = flow.at[0, 6, 7, 0].set(2e11).at[0, 1, 1, 1].set(-1e11)
    np.testing.assert_array_equal(
        np.asarray(flow_warp(x, clamp_flow(flow_f, h, w))),
        np.asarray(flow_warp(x, flow_f)))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)),
    ((16, 16), (8, 8)),
    ((12, 10), (7, 23)),
    ((9, 9), (18, 18)),
])
def test_bilinear_resize_matches_interpolate(in_hw, out_hw):
    torch.manual_seed(7)
    x = torch.randn(2, 3, *in_hw)
    ref = TF.interpolate(x, size=out_hw, mode="bilinear",
                         align_corners=False).numpy()
    out = bilinear_resize(t2j_nhwc(x), out_hw)
    np.testing.assert_allclose(j2n_nchw(out), ref, atol=2e-5, rtol=1e-4)


def test_bilinear_up_down2():
    torch.manual_seed(8)
    x = torch.randn(1, 4, 10, 12)
    ref_up = TF.interpolate(x, size=(20, 24), mode="bilinear",
                            align_corners=False).numpy()
    ref_dn = TF.interpolate(x, size=(5, 6), mode="bilinear",
                            align_corners=False).numpy()
    np.testing.assert_allclose(j2n_nchw(bilinear_upsample2(t2j_nhwc(x))),
                               ref_up, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(j2n_nchw(bilinear_downsample2(t2j_nhwc(x))),
                               ref_dn, atol=2e-5, rtol=1e-4)


def test_flow_warp_lowmem_matches_eager():
    from lssvc_tpu.ops.warp import flow_warp, flow_warp_lowmem

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(2, 13, 37, 5)).astype(np.float32))
    flow = jnp.asarray((rng.uniform(-4, 4, size=(2, 13, 37, 2)))
                       .astype(np.float32))
    np.testing.assert_allclose(np.asarray(flow_warp_lowmem(x, flow)),
                               np.asarray(flow_warp(x, flow)),
                               atol=1e-5, rtol=1e-5)


def test_grouped_warp_lowmem_matches_eager_block_path():
    from lssvc_tpu.ops.warp import flow_warp_grouped, grouped_warp_lowmem

    rng = np.random.default_rng(32)
    group_num, offset_num, cg = 4, 2, 2  # c_src=8, go=8
    x = jnp.asarray(rng.normal(size=(2, 12, 24, 8)).astype(np.float32))
    fx = jnp.asarray(rng.uniform(-3, 3, size=(2, 12, 24, 8))
                     .astype(np.float32))
    fy = jnp.asarray(rng.uniform(-3, 3, size=(2, 12, 24, 8))
                     .astype(np.float32))
    mask = jnp.asarray(rng.random((2, 12, 24, 8)).astype(np.float32))

    # eager block path (what grouped_warp_auto's non-TPU branch computes)
    planes = [x[..., k::cg] for k in range(cg)]
    x_blk = jnp.concatenate([p for plane in planes
                             for p in (plane,) * offset_num], axis=-1)
    ref = flow_warp_grouped(x_blk, fx, fy) * jnp.concatenate([mask] * cg,
                                                             axis=-1)
    out = grouped_warp_lowmem(x, fx, fy, mask, group_num)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
