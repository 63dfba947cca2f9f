"""Quality metrics: PSNR and (MS-)SSIM.

Matches the reference's metric conventions
(`/root/reference/src/utils/metric.py`, `test.py:107-118,290-291`):
  * per-plane SSIM via an 11x11 sigma=1.5 Gaussian window, fftconvolve;
  * MS-SSIM with HM-style level/weight fallback for small frames
    (<176 -> 4 levels, <88 -> 3 levels);
  * YUV-weighted PSNR (6*Y + U + V) / 8.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage, signal


def fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    x, y = np.mgrid[-size // 2 + 1:size // 2 + 1, -size // 2 + 1:size // 2 + 1]
    g = np.exp(-((x ** 2 + y ** 2) / (2.0 * sigma ** 2)))
    return g / g.sum()


def calc_ssim(img1: np.ndarray, img2: np.ndarray, data_range: float = 255):
    """Returns (ssim_map, cs_map) for two 2D arrays."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = fspecial_gauss(11, 1.5)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    mu1 = signal.fftconvolve(window, img1, mode="valid")
    mu2 = signal.fftconvolve(window, img2, mode="valid")
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = signal.fftconvolve(window, img1 * img1, mode="valid") - mu1_sq
    sigma2_sq = signal.fftconvolve(window, img2 * img2, mode="valid") - mu2_sq
    sigma12 = signal.fftconvolve(window, img1 * img2, mode="valid") - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    cs_map = (2.0 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    return ssim_map, cs_map


def calc_msssim(img1: np.ndarray, img2: np.ndarray, data_range: float = 255) -> float:
    """MS-SSIM for two 2D arrays with HM small-frame fallback."""
    level = 5
    weight = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    height, width = img1.shape
    if height < 176 or width < 176:
        level = 4
        weight = np.array([0.0517, 0.3295, 0.3462, 0.2726])
    if height < 88 or width < 88:
        level = 3
        weight = np.array([0.2, 0.5, 0.3])
    downsample_filter = np.ones((2, 2)) / 4.0
    im1 = img1.astype(np.float64)
    im2 = img2.astype(np.float64)
    mssim = []
    mcs = []
    for _ in range(level):
        ssim_map, cs_map = calc_ssim(im1, im2, data_range=data_range)
        mssim.append(ssim_map.mean())
        mcs.append(cs_map.mean())
        im1 = ndimage.convolve(im1, downsample_filter, mode="reflect")[::2, ::2]
        im2 = ndimage.convolve(im2, downsample_filter, mode="reflect")[::2, ::2]
    mssim = np.array(mssim)
    mcs = np.array(mcs)
    return float(np.prod(mcs[:level - 1] ** weight[:level - 1]) *
                 (mssim[level - 1] ** weight[level - 1]))


def calc_msssim_rgb(img1: np.ndarray, img2: np.ndarray, data_range: float = 255) -> float:
    """MS-SSIM averaged over the channels of 3xHxW arrays."""
    return sum(calc_msssim(img1[i], img2[i], data_range) for i in range(3)) / 3


def calc_psnr(img1: np.ndarray, img2: np.ndarray, data_range: float = 255) -> float:
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean(np.square(img1 - img2))
    return mse_to_psnr(mse, data_range)


def mse_to_psnr(mse: float, data_range: float = 1) -> float:
    if not np.isfinite(mse):
        # NaN/inf reconstruction must surface as NaN, not saturate to the
        # identical-frames sentinel: `NaN > 1e-10` is False, and one
        # silently-999.9 frame averaged into a sequence reads as a
        # plausible high-PSNR result (observed: an int8 eval with one NaN
        # frame in twelve reported 89 dB)
        return float("nan")
    if mse > 1e-10:
        return float(10 * np.log10(data_range * data_range / mse))
    return 999.9  # identical frames (reference sentinel, `test.py:107-112`)


def yuv_weighted_psnr(y_psnr: float, u_psnr: float, v_psnr: float) -> float:
    return (6 * y_psnr + u_psnr + v_psnr) / 8
