"""Comparison helpers for golden-parity tests.

Quantizing codecs contain round() calls; with random-init weights the
latents are large and fp32 op-order differences between torch and XLA can
flip a handful of near-tie roundings (±1 on a latent), which then perturbs
downstream activations.  `assert_close_mostly` therefore allows a small
fraction of elements to disagree beyond tolerance — enough to catch real
bugs (wrong layer wiring perturbs everything) while ignoring tie flips.
"""

import numpy as np


def assert_close_mostly(actual, desired, atol=1e-4, rtol=1e-3,
                        max_mismatch_frac=0.005):
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    assert actual.shape == desired.shape
    diff = np.abs(actual - desired)
    tol = atol + rtol * np.abs(desired)
    frac = float(np.mean(diff > tol))
    assert frac <= max_mismatch_frac, (
        f"{frac * 100:.3f}% of elements mismatched "
        f"(max abs diff {diff.max():.4g})")


def assert_rel_rms(actual, desired, max_rel_rms=0.05):
    """For outputs of numerically chaotic random-init nets (activations in
    the thousands; round-tie flips in quantized latents shift broad recon
    regions).  Relative RMS separates regimes cleanly: op-order noise gives
    ~1%, a wiring bug gives ~100%."""
    actual = np.asarray(actual)
    desired = np.asarray(desired)
    assert actual.shape == desired.shape
    rel = float(np.sqrt(np.mean((actual - desired) ** 2))
                / max(np.sqrt(np.mean(desired ** 2)), 1e-12))
    assert rel <= max_rel_rms, f"relative RMS {rel:.4f} > {max_rel_rms}"
