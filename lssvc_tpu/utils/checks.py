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


def sanitize_dpb(dpb: dict, bound: float = 65536.0) -> dict:
    """Bound the decoded-picture-buffer recurrence at serving stream
    boundaries.

    A model served beyond its trained chain length (e.g. the reference
    protocol's GOP 32 with a cascade trained on T=3 chains) can drift its
    feedback features out of distribution until some P-frame's prior nets
    emit non-finite symbol planes — observed on 96f 1080p GOP32: warp
    PSNR decays over ~11 P-frames, then NaN `y_means` aborts the encode
    (the `assert_finite` guard, correctly).  Clamping the recurrence at
    the frame boundary keeps every frame's inputs bounded, turning a hard
    encode abort into graceful quality degradation until the next intra
    refresh.

    Synchronization: the encoder's feedback DPB IS the decoder's output,
    so applying the same clamp at both compress() and decompress()
    entries keeps the two in lockstep.  A healthy DPB passes through
    bit-identical: frames are bounded at +-8 (not [0,1] — the reference
    clamps recon to [0,1] only in its serving decode, dmc_net_extend.py
    :138, while the forward/estimated path is unclamped; a [0,1] clamp
    here would break closed-loop stream-vs-forward parity at random
    init, whose recon lives in roughly +-3), features at +-bound (65536:
    random-init inter-layer textures reach +-3.6e3, trained features far
    less; the observed blowups are 1e9+), both far above healthy
    magnitudes and orders below the blowups.  Disable with
    LSSVC_DPB_SANITIZE=0.
    """
    import os

    import jax.numpy as jnp

    if os.environ.get("LSSVC_DPB_SANITIZE", "1") == "0":
        return dpb
    out = {}
    for k, v in dpb.items():
        if v is None or not hasattr(v, "dtype"):
            out[k] = v
            continue
        lo, hi = (-8.0, 8.0) if k.startswith("ref_frame") else (-bound, bound)
        out[k] = jnp.clip(jnp.nan_to_num(v, nan=0.0, posinf=hi, neginf=lo),
                          lo, hi)
    return out


def assert_finite_np(what: str, **arrays) -> None:
    """Host-side variant for numpy planes at the coder boundary."""
    bad = sorted(k for k, a in arrays.items()
                 if not np.all(np.isfinite(np.asarray(a))))
    if bad:
        raise FloatingPointError(
            f"{what}: non-finite values in {bad}; refusing to emit a "
            "corrupt bitstream")
