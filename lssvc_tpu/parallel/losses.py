"""Training losses.

`rd_loss_intra` mirrors the reference's RDLossIntra
(`/root/reference/src/IntraModules/rd_loss_intra.py:6-37`):
lambda * 255^2 * MSE + bpp, with the bpp split by latent.  `ms_ssim` is a
differentiable JAX MS-SSIM for perceptual fine-tuning (the reference uses
pytorch_msssim's MS_SSIM module for the same purpose).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2 = math.log(2.0)
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def rd_loss_intra(z_likelihood, y_likelihood, x_hat, target, lmbda=1e-2):
    n, h, w, _ = target.shape
    num_pixels = n * h * w
    out = {}
    out["z_bpp_loss"] = jnp.sum(jnp.log(z_likelihood)) / (-LOG2 * num_pixels)
    out["y_bpp_loss"] = jnp.sum(jnp.log(y_likelihood)) / (-LOG2 * num_pixels)
    out["bpp_loss"] = out["z_bpp_loss"] + out["y_bpp_loss"]
    out["mse_loss"] = jnp.mean(jnp.square(x_hat - target))
    out["loss"] = lmbda * 255.0 ** 2 * out["mse_loss"] + out["bpp_loss"]
    return out


def _gaussian_window(size: int, sigma: float = 1.5):
    coords = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def _filter2d_valid(x, win):
    """Separable valid-mode filtering on NHWC."""
    k = win.shape[0]
    c = x.shape[-1]
    wh = win.reshape(k, 1, 1, 1)
    ww = win.reshape(1, k, 1, 1)
    wh = jnp.tile(wh, (1, 1, 1, c))
    ww = jnp.tile(ww, (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, wh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jax.lax.conv_general_dilated(
        x, ww, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _ssim_cs(x, y, win, data_range, K=(0.01, 0.03)):
    C1 = (K[0] * data_range) ** 2
    C2 = (K[1] * data_range) ** 2
    mu1 = _filter2d_valid(x, win)
    mu2 = _filter2d_valid(y, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d_valid(x * x, win) - mu1_sq
    s2 = _filter2d_valid(y * y, win) - mu2_sq
    s12 = _filter2d_valid(x * y, win) - mu12
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    ssim = ((2 * mu12 + C1) / (mu1_sq + mu2_sq + C1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


def ms_ssim(x, y, data_range: float = 1.0, win_size: int = 11):
    """Differentiable MS-SSIM on NHWC batches."""
    win = _gaussian_window(win_size)
    levels = len(_MSSSIM_WEIGHTS)
    mcs = []
    ssim_val = 0.0
    for i in range(levels):
        ssim_val, cs = _ssim_cs(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(cs, 0.0))
            pad_h = x.shape[1] % 2
            pad_w = x.shape[2] % 2
            if pad_h or pad_w:
                x = x[:, :x.shape[1] - pad_h, :x.shape[2] - pad_w]
                y = y[:, :y.shape[1] - pad_h, :y.shape[2] - pad_w]
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    result = jnp.prod(jnp.stack(mcs) ** weights[:levels - 1]) * \
        (jnp.maximum(ssim_val, 0.0) ** weights[-1])
    return result
