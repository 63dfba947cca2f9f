"""Finiteness guards at symbol-plane boundaries.

A NaN latent cast to int32 (device or host) silently encodes garbage into
the rANS stream instead of failing loudly; every stream-encode path guards
its float planes here before quantization.  One fused device program + one
host fetch per call keeps the cost to a single tiny dispatch per frame.
"""

from __future__ import annotations

import numpy as np


def _flags(tensors):
    import jax.numpy as jnp

    return {k: jnp.isfinite(v).all() for k, v in tensors.items()}


_flags_jit = None


def assert_finite(what: str, **tensors) -> None:
    """Raise FloatingPointError naming the offending planes if any device
    tensor contains NaN/Inf.  Single jitted reduction, one host sync.

    NOTE: this BLOCKS the dispatching thread until the inputs have
    executed.  On the async stream-encode path use `finite_flags` (device,
    non-blocking) + `raise_if_nonfinite` (host worker, where np.asarray
    already blocks) instead."""
    flags = finite_flags(**tensors)
    raise_if_nonfinite(what, flags)


def finite_flags(**tensors):
    """Dict of device bool scalars, one fused jitted reduction, NO host
    sync — safe to compute mid-frame on the dispatch thread and ship to
    the host worker alongside the symbol planes."""
    global _flags_jit
    import jax

    if _flags_jit is None:
        _flags_jit = jax.jit(_flags)
    return _flags_jit(dict(tensors))


def raise_if_nonfinite(what: str, flags) -> None:
    """Host half: blocks on the flag scalars (tiny) and raises naming the
    offending planes."""
    import jax

    flags = jax.device_get(flags)
    bad = sorted(k for k, ok in flags.items() if not ok)
    if bad:
        raise FloatingPointError(
            f"{what}: non-finite values in {bad}; refusing to emit a "
            "corrupt bitstream")


def assert_finite_np(what: str, **arrays) -> None:
    """Host-side variant for numpy planes at the coder boundary."""
    bad = sorted(k for k, a in arrays.items()
                 if not np.all(np.isfinite(np.asarray(a))))
    if bad:
        raise FloatingPointError(
            f"{what}: non-finite values in {bad}; refusing to emit a "
            "corrupt bitstream")
