#!/usr/bin/env python
"""Compile-only repro for the grouped cblock warp kernel at the bench
shape (the 2026-08 compile-helper update's Mosaic rejects dynamic
sublane-dim store indices; the kernel now stores row-planar).

Runs a remote AOT compile of JUST the grouped warp at the 1080p
OffsetDiversity shape — ~1 min instead of a 10-min full-model compile —
then executes once and checks against the XLA gather fallback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from lssvc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from lssvc_tpu.ops import warp_pallas as wp
    from lssvc_tpu.ops.warp import grouped_warp_lowmem

    h, w = 1152, 1920
    group_num, go, c = 16, 32, 48  # OffsetDiversity EL shapes
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, h, w, c)), jnp.float32)
    fx = jnp.asarray(rng.random((1, h, w, go)) * 4 - 2, jnp.float32)
    fy = jnp.asarray(rng.random((1, h, w, go)) * 4 - 2, jnp.float32)
    mask = jnp.asarray(rng.random((1, h, w, go)), jnp.float32)

    t0 = time.time()
    out = wp._grouped_warp_pallas_cblock(x, fx, fy, mask, group_num)
    out = jax.block_until_ready(out)
    print(f"grouped cblock compiled+ran in {time.time() - t0:.1f}s "
          f"out={out.shape} finite={bool(jnp.isfinite(out).all())}")

    # exact-fallback check on a small crop (full-res ref is slow on host)
    hs, ws = 128, 256
    ref = grouped_warp_lowmem(x[:, :hs, :ws], fx[:, :hs, :ws],
                                   fy[:, :hs, :ws], mask[:, :hs, :ws],
                                   group_num)
    got = wp._grouped_warp_pallas_cblock(
        x[:, :hs, :ws], fx[:, :hs, :ws], fy[:, :hs, :ws],
        mask[:, :hs, :ws], group_num)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"max |pallas - lowmem| on {hs}x{ws}: {err:.2e}")
    assert err < 2e-5, err


if __name__ == "__main__":
    main()
