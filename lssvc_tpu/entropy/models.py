"""Entropy-model math, fp32 on device.

Implements the probability models used by all networks:

  * factorized "Bitparm" density (4-layer monotone MLP per channel) — the
    video-side BitEstimator (`/root/reference/src/entropy_models/
    video_entropy_models.py:110-166`);
  * Laplace-CDF interval likelihood for the conditional latents
    (`dmc_net.py:370-377`);
  * erfc Gaussian conditional (`img_entropy_models.py:575-691`);
  * Ballé factorized EntropyBottleneck `_logits_cumulative`
    (`img_entropy_models.py:373-554`).

All are pure jnp functions; bit counts are computed with the reference's
clamp conventions (probs + 1e-5, bits clipped to [0, 50] per element) so
estimated bpp matches the torch implementation to fp32 accuracy.

Activations are NHWC; per-channel Bitparm parameters are stored (1,1,1,C).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nn import ste_round

LOG2 = math.log(2.0)


def _softplus(x):
    return jax.nn.softplus(x)


def bitparm_forward(p, x, final: bool):
    """One Bitparm layer. p: scoped params with h/b(/a) of shape (1,1,1,C)."""
    h = p("h")
    b = p("b")
    if final:
        return jax.nn.sigmoid(x * _softplus(h) + b)
    a = p("a")
    x = x * _softplus(h) + b
    return x + jnp.tanh(x) * jnp.tanh(a)


def bit_estimator_forward(p, x):
    """Factorized CDF F(x) in [0,1]; x NHWC, params f1..f4."""
    x = bitparm_forward(p.sub("f1"), x, final=False)
    x = bitparm_forward(p.sub("f2"), x, final=False)
    x = bitparm_forward(p.sub("f3"), x, final=False)
    return bitparm_forward(p.sub("f4"), x, final=True)


def likelihood_to_bits(probs):
    """sum(clamp(-log(p + 1e-5)/log 2, 0, 50)) — reference bit-count clamps."""
    bits = jnp.clip(-jnp.log(probs + 1e-5) / LOG2, 0.0, 50.0)
    return jnp.sum(bits)


def factorized_bits(p, z):
    """Total bits of z under the factorized Bitparm model (z already quantized)."""
    prob = bit_estimator_forward(p, z + 0.5) - bit_estimator_forward(p, z - 0.5)
    return likelihood_to_bits(prob), prob


def laplace_cdf(x, scale):
    """CDF of Laplace(0, scale): 0.5 - 0.5*sign(x)*expm1(-|x|/scale)."""
    return 0.5 - 0.5 * jnp.sign(x) * jnp.expm1(-jnp.abs(x) / scale)


def laplace_bits(y, sigma):
    """Interval likelihood bits under Laplace(0, sigma) (sigma clamped)."""
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    probs = laplace_cdf(y + 0.5, sigma) - laplace_cdf(y - 0.5, sigma)
    return likelihood_to_bits(probs), probs


# ---------------------------------------------------------------------------
# Gaussian conditional (image-side)

def _std_cumulative(x):
    """0.5 * erfc(-x / sqrt(2)) — numerically robust standard normal CDF."""
    const = -(2.0 ** -0.5)
    return 0.5 * jax.lax.erfc(const * x)


def gaussian_conditional_likelihood(inputs, scales, means=None,
                                    scale_bound: float = 0.11,
                                    likelihood_bound: float = 1e-9):
    """P(round(x) | N(means, scales^2)) with half-interval integration."""
    values = inputs - means if means is not None else inputs
    scales = jnp.maximum(scales, scale_bound)
    values = jnp.abs(values)
    upper = _std_cumulative((0.5 - values) / scales)
    lower = _std_cumulative((-0.5 - values) / scales)
    likelihood = upper - lower
    if likelihood_bound > 0:
        likelihood = jnp.maximum(likelihood, likelihood_bound)
    return likelihood


def gaussian_conditional_dequantize(inputs, means):
    """Eval-mode quantization: round(x - means) + means."""
    return ste_round(inputs - means) + means


# ---------------------------------------------------------------------------
# EntropyBottleneck (Ballé factorized prior)

def entropy_bottleneck_logits(p, inputs, filters=(3, 3, 3, 3)):
    """_logits_cumulative: inputs shaped (C, 1, N); matrices (C, fo, fi)."""
    logits = inputs
    n_layers = len(filters) + 1
    for i in range(n_layers):
        matrix = _softplus(p(f"_matrices.{i}"))
        logits = jnp.einsum("cof,cfn->con", matrix, logits,
                            precision=jax.lax.Precision.HIGHEST)
        logits = logits + p(f"_biases.{i}")
        if i < len(filters):
            factor = p(f"_factors.{i}")
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


def entropy_bottleneck_forward(p, x, filters=(3, 3, 3, 3),
                               likelihood_bound: float = 1e-9):
    """Eval-mode forward: quantize around medians + interval likelihood.

    x: NHWC. Returns (x_hat NHWC, likelihood NHWC).
    """
    n, h, w, c = x.shape
    medians = p("quantiles")[:, 0, 1]  # (C,)
    values = jnp.transpose(x, (3, 0, 1, 2)).reshape(c, 1, -1)

    med = medians[:, None, None]
    outputs = ste_round(values - med) + med

    lower = entropy_bottleneck_logits(p, outputs - 0.5, filters)
    upper = entropy_bottleneck_logits(p, outputs + 0.5, filters)
    sign = -jnp.sign(lower + upper)
    likelihood = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    if likelihood_bound > 0:
        likelihood = jnp.maximum(likelihood, likelihood_bound)

    x_hat = jnp.transpose(outputs.reshape(c, n, h, w), (1, 2, 3, 0))
    like = jnp.transpose(likelihood.reshape(c, n, h, w), (1, 2, 3, 0))
    return x_hat, like


def entropy_bottleneck_aux_loss(p, tail_mass: float = 1e-9,
                                filters=(3, 3, 3, 3)):
    """Quantile auxiliary loss: |logits(quantiles) - target| summed
    (`img_entropy_models.py:478-481`).  Minimized to keep the learned
    quantiles at the tail-mass boundaries."""
    quantiles = p("quantiles")  # (C, 1, 3)
    target = math.log(2 / tail_mass - 1)
    targets = jnp.asarray([-target, 0.0, target])
    logits = entropy_bottleneck_logits(p, quantiles, filters)
    return jnp.sum(jnp.abs(logits - targets))


def fit_entropy_bottleneck_quantiles(p, tail_mass: float = 1e-9,
                                     filters=(3, 3, 3, 3), iters: int = 64):
    """Solve the quantiles exactly by per-channel bisection.

    The aux loss drives `logits(quantiles) -> (-t, 0, t)` by SGD; since
    `_logits_cumulative` is monotone in its input (softplus-positive
    matrices, |tanh(factor)| < 1 — the standard monotone construction),
    the same targets can be hit exactly by root-finding, which is what a
    converged aux optimizer would produce (`img_entropy_models.py:478-481`).
    Used at training-checkpoint time so real-bitstream CDF tables are
    tight regardless of how far the aux SGD got.
    """
    target = math.log(2 / tail_mass - 1)
    targets = jnp.asarray([-target, 0.0, target])
    c = p("quantiles").shape[0]

    # bracket by doubling: the logits slope at init is the product of five
    # softplus'd small matrices, so the roots can sit thousands of units
    # out.  13 doublings cap the bracket at +/-8192: a channel whose tails
    # are unreachable within that saturates there, costing only a heavier
    # CDF tail (bypass-coded) — whereas an unbounded quantile would make
    # the table builder allocate `arange(quantile_range)` per channel
    # (entropy/coder.py:170-173).
    def widen(_, b):
        lo, hi = b
        v_lo = entropy_bottleneck_logits(p, lo, filters)
        v_hi = entropy_bottleneck_logits(p, hi, filters)
        lo = jnp.where(v_lo > targets, lo * 2.0, lo)
        hi = jnp.where(v_hi < targets, hi * 2.0, hi)
        return lo, hi

    lo = jnp.full((c, 1, 3), -1.0, jnp.float32)
    hi = jnp.full((c, 1, 3), 1.0, jnp.float32)
    lo, hi = jax.lax.fori_loop(0, 13, widen, (lo, hi))

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        v = entropy_bottleneck_logits(p, mid, filters)
        too_low = v < targets
        return jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def refit_quantiles(params):
    """Return a copy of a flat param dict with every EntropyBottleneck's
    quantiles re-solved by bisection (see fit_entropy_bottleneck_quantiles).
    Bottlenecks are located by their `<prefix>quantiles` key with sibling
    `<prefix>_matrices.0`."""
    from ..convert import P

    out = dict(params)
    for k in params:
        if k.endswith("quantiles"):
            prefix = k[: -len("quantiles")]
            if prefix + "_matrices.0" in params:
                p = P(params, prefix)
                out[k] = fit_entropy_bottleneck_quantiles(p)
    return out


# ---------------------------------------------------------------------------
# Scale tables / index builders (for the real-bitstream path)

def _log_scale_table(smin, smax, levels):
    return np.exp(np.linspace(math.log(smin), math.log(smax), levels)).astype(np.float32)


# video side: 256 Laplace scales in [0.01, 64] (video_entropy_models.py:247-258)
GAUSSIAN_SCALE_TABLE_VIDEO = _log_scale_table(0.01, 64.0, 256)
# image side: 64 Gaussian scales in [0.11, 256] (img_entropy_models.py:586-596)
GAUSSIAN_SCALE_TABLE_IMG = _log_scale_table(0.11, 256.0, 64)


def build_indexes_video(scales):
    """Video-side scale->table-index map (no +1 shift)."""
    log_min = math.log(0.01)
    step = (math.log(64.0) - log_min) / (256 - 1)
    scales = jnp.maximum(scales, 1e-5)
    idx = (jnp.log(scales) - log_min) / step
    return jnp.clip(idx, 0, 255).astype(jnp.int32)


def build_indexes_img(scales):
    """Image-side map — note the reference's +1 bias (img_entropy_models.py:689)."""
    log_min = math.log(0.11)
    step = (math.log(256.0) - log_min) / (64 - 1)
    scales = jnp.maximum(scales, 1e-5)
    idx = (jnp.log(scales) - log_min) / step + 1
    return jnp.clip(idx, 0, 63).astype(jnp.int32)
