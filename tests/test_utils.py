"""Utils tests: padding math, color conversion, imresize, metrics, stream."""

import math
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lssvc_tpu.utils import (
    get_padding_size, get_interlayer_padding, inverse_padding_size,
    rgb_to_ycbcr420, ycbcr420_to_rgb, rgb_to_ycbcr, ycbcr_to_rgb,
    imresize, encode_i, decode_i, encode_p, decode_p, get_downsampled_shape,
)
from lssvc_tpu.utils.metrics import calc_msssim, calc_psnr


def test_get_padding_size():
    assert get_padding_size(1080, 1920) == (0, 0, 0, 8)
    assert get_padding_size(480, 832) == (0, 0, 0, 32)
    assert get_padding_size(64, 64) == (0, 0, 0, 0)


@pytest.mark.parametrize("h,w,ratio", [
    (1080, 1920, 2.0), (1080, 1920, 1.5), (1080, 1920, 3.0), (1080, 1920, 4.0),
    (480, 832, 2.0), (480, 832, 1.5), (720, 1280, 2.0), (240, 416, 2.0),
])
def test_interlayer_padding_divisibility(h, w, ratio):
    r = get_interlayer_padding(h, w, ratio)
    H, W = r["HR_padded_size"]
    Hl, Wl = r["LR_padded_size"]
    assert H % 64 == 0 and W % 64 == 0
    assert H % (64 * ratio) == 0 and W % (64 * ratio) == 0
    assert Hl * ratio == H and Wl * ratio == W
    assert Hl % 64 == 0 and Wl % 64 == 0
    pl, pr, pt, pb = r["P_HR"]
    assert (h + pt + pb, w + pl + pr) == (H, W)


def test_interlayer_padding_1080_x2_values():
    # known values: 1080 -> 1152 (mult of 128), 1920 stays
    r = get_interlayer_padding(1080, 1920, 2.0)
    assert r["HR_padded_size"] == (1152, 1920)
    assert r["LR_padded_size"] == (576, 960)
    assert r["LR_size"] == (540, 960)


def test_inverse_padding():
    assert inverse_padding_size((0, 3, 0, 5)) == (0, -3, 0, -5)


def test_color_matches_reference_bitexact():
    """The factored plane-space conversion must reproduce the reference's
    numbers exactly (`/root/reference/src/utils/functional.py:16-58`) —
    the YUV<->RGB round trip feeds PSNR, so any drift skews results."""
    from ref_oracle import import_reference

    import_reference()
    from src.utils.functional import rgb_to_ycbcr420 as ref_fwd
    from src.utils.functional import ycbcr420_to_rgb as ref_inv

    rng = np.random.default_rng(5)
    rgb = rng.random((3, 64, 96)).astype(np.float32)
    y, uv = rgb_to_ycbcr420(rgb)
    ry, ruv = ref_fwd(rgb)
    np.testing.assert_array_equal(y, ry)
    np.testing.assert_array_equal(uv, ruv)
    np.testing.assert_array_equal(ycbcr420_to_rgb(y, uv), ref_inv(ry, ruv))


def test_color_roundtrip():
    # smooth image: 4:2:0 chroma subsampling is near-lossless on smooth
    # content but heavily lossy on per-pixel noise
    gy, gx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 48),
                         indexing="ij")
    rgb = np.stack([gy, gx, 0.5 * (gx + gy)]).astype(np.float32)
    y, uv = rgb_to_ycbcr420(rgb)
    assert y.shape == (1, 32, 48) and uv.shape == (2, 16, 24)
    rec = ycbcr420_to_rgb(y, uv)
    assert rec.shape == rgb.shape
    assert np.mean(np.abs(rec - rgb)) < 0.02

    yuv = rgb_to_ycbcr(rgb)
    rec444 = ycbcr_to_rgb(yuv)
    np.testing.assert_allclose(rec444, rgb, atol=1e-5)


def _ref_imresize(x, sizes):
    """Oracle: the reference's standalone MATLAB-bicubic (torch)."""
    sys.path.insert(0, "/root/reference")
    try:
        from src.utils.core import imresize as ref_imresize
        return ref_imresize(x, sizes=sizes)
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 64), (32, 32)),      # x2 down
    ((96, 128), (64, 86)),     # x1.5 down (non-integer)
    ((48, 48), (16, 16)),      # x3 down
    ((32, 32), (64, 64)),      # x2 up
    ((30, 42), (17, 23)),      # odd sizes
])
def test_imresize_matches_matlab_bicubic(in_hw, out_hw):
    torch.manual_seed(0)
    x = torch.rand(1, 3, *in_hw)
    ref = _ref_imresize(x, sizes=out_hw).numpy()
    out = np.asarray(imresize(jnp.asarray(x.numpy()), sizes=out_hw))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_imresize_scale_arg():
    torch.manual_seed(1)
    x = torch.rand(1, 1, 64, 64)
    ref = _ref_imresize(x, sizes=(32, 32)).numpy()
    out = np.asarray(imresize(jnp.asarray(x.numpy()), scale=0.5))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_psnr_msssim_sanity():
    rng = np.random.default_rng(1)
    a = rng.random((256, 256))
    assert calc_psnr(a, a, data_range=1) == 999.9
    b = np.clip(a + rng.normal(0, 0.01, a.shape), 0, 1)
    p = calc_psnr(a, b, data_range=1)
    assert 35 < p < 45
    s = calc_msssim(a, b, data_range=1)
    assert 0.5 < s <= 1.0
    assert calc_msssim(a, a, data_range=1) > 0.999


def test_msssim_matches_reference_bitexact():
    """The restructured MS-SSIM (batched moment convolution, explicit
    pyramid) must reproduce the reference implementation's numbers
    exactly — metric parity is a hard contract for result-JSON
    comparability (`/root/reference/src/utils/metric.py:39-70`)."""
    from ref_oracle import import_reference

    import_reference()
    from src.utils.metric import calc_msssim as ref_msssim

    rng = np.random.default_rng(3)
    for shape in ((192, 256), (100, 120), (64, 72)):  # 5/4/3-level paths
        a = rng.random(shape)
        b = np.clip(a + rng.normal(0, 0.02, shape), 0, 1)
        ours = calc_msssim(a, b, data_range=1)
        ref = ref_msssim(a, b, data_range=1)
        assert ours == pytest.approx(ref, abs=1e-12), (shape, ours, ref)


def test_msssim_small_frame_fallback():
    rng = np.random.default_rng(2)
    a = rng.random((100, 100))  # triggers 4-level path
    b = np.clip(a + 0.01, 0, 1)
    s = calc_msssim(a, b, data_range=1)
    assert 0 < s <= 1.0
    a = rng.random((64, 64))  # triggers 3-level path
    s = calc_msssim(a, np.clip(a + 0.01, 0, 1), data_range=1)
    assert 0 < s <= 1.0


def test_stream_container_roundtrip(tmp_path):
    y, z = b"hello-y-string", b"zz"
    p = str(tmp_path / "i.bin")
    encode_i(1080, 1920, y, z, p)
    h, w, y2, z2 = decode_i(p)
    assert (h, w, y2, z2) == (1080, 1920, y, z)

    p2 = str(tmp_path / "p.bin")
    encode_p(b"\x00\x01payload", p2)
    assert decode_p(p2) == b"\x00\x01payload"


def test_get_downsampled_shape():
    assert get_downsampled_shape(1080, 1920, 64) == (17, 30)
    assert get_downsampled_shape(1152, 1920, 64) == (18, 30)


def test_finite_guards_raise_on_nan():
    """Stream-path NaN refusal: device flags (async) + host raise name the
    offending plane; clean tensors pass silently."""
    import jax.numpy as jnp
    import pytest

    from lssvc_tpu.utils.checks import (
        assert_finite,
        assert_finite_np,
        finite_flags,
        raise_if_nonfinite,
    )

    flags = finite_flags(good=jnp.ones(4), bad=jnp.array([1.0, jnp.nan]))
    with pytest.raises(FloatingPointError, match="bad"):
        raise_if_nonfinite("unit", flags)
    raise_if_nonfinite("unit", finite_flags(good=jnp.ones(2)))

    with pytest.raises(FloatingPointError, match="x"):
        assert_finite("unit", x=jnp.array([jnp.inf]))
    with pytest.raises(FloatingPointError, match="y"):
        assert_finite_np("unit", y=np.array([np.nan]))


def test_ms_ssim_rgb_matches_pytorch_msssim_algorithm():
    """Oracle: a faithful torch replication of pytorch_msssim.ms_ssim
    (gaussian valid-mode windows, F.avg_pool2d(kernel=2, padding=s%2)
    downsampling with zeros counted, relu'd per-channel cs/ssim, product
    over levels per channel, then channel mean).  Includes odd spatial
    dims, which hit the zero-padded pooling path (1080p does at level 4)."""
    import torch
    import torch.nn.functional as F

    from lssvc_tpu.utils.msssim_rgb import ms_ssim_rgb

    def torch_ms_ssim(X, Y, data_range=1.0, win_size=11, win_sigma=1.5,
                      K=(0.01, 0.03)):
        weights = torch.tensor([0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
                               dtype=torch.float64)
        coords = torch.arange(win_size, dtype=torch.float64) - win_size // 2
        g = torch.exp(-(coords ** 2) / (2 * win_sigma ** 2))
        g = (g / g.sum())
        win = (g[:, None] @ g[None, :])[None, None]
        C = X.shape[1]
        win = win.repeat(C, 1, 1, 1)
        C1 = (K[0] * data_range) ** 2
        C2 = (K[1] * data_range) ** 2

        def _ssim(X, Y):
            mu1 = F.conv2d(X, win, groups=C)
            mu2 = F.conv2d(Y, win, groups=C)
            mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
            s1 = F.conv2d(X * X, win, groups=C) - mu1_sq
            s2 = F.conv2d(Y * Y, win, groups=C) - mu2_sq
            s12 = F.conv2d(X * Y, win, groups=C) - mu1_mu2
            cs_map = (2 * s12 + C2) / (s1 + s2 + C2)
            ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
            return ssim_map.mean(dim=(2, 3)), cs_map.mean(dim=(2, 3))

        mcs = []
        ssim_pc = None
        for i in range(len(weights)):
            ssim_pc, cs = _ssim(X, Y)
            if i < len(weights) - 1:
                mcs.append(torch.relu(cs))
                pad = [s % 2 for s in X.shape[2:]]
                X = F.avg_pool2d(X, kernel_size=2, padding=pad)
                Y = F.avg_pool2d(Y, kernel_size=2, padding=pad)
        stack = torch.stack(mcs + [torch.relu(ssim_pc)])
        val = torch.prod(stack ** weights.view(-1, 1, 1), dim=0)
        return float(val.mean())

    rng = np.random.default_rng(5)
    for h, w in ((192, 256), (3 * 64 + 9, 180 + 7)):  # even + odd dims
        a = rng.random((3, h, w))
        b = np.clip(a + rng.normal(0, 0.03, a.shape), 0, 1)
        ref = torch_ms_ssim(torch.tensor(a[None], dtype=torch.float64),
                            torch.tensor(b[None], dtype=torch.float64))
        ours = ms_ssim_rgb(a, b)
        assert abs(ours - ref) < 1e-8, (h, w, ours, ref)


def test_mse_to_psnr_nan_propagates():
    """NaN/inf MSE must yield NaN PSNR, not the identical-frames 999.9
    sentinel (a single masked-NaN frame averaged into a sequence reads as
    a plausible high-PSNR result)."""
    import numpy as np

    from lssvc_tpu.utils.metrics import mse_to_psnr

    assert np.isnan(mse_to_psnr(float("nan")))
    assert np.isnan(mse_to_psnr(float("inf")))
    assert mse_to_psnr(0.0) == 999.9
    assert abs(mse_to_psnr(0.01) - 20.0) < 1e-6
