#!/usr/bin/env python
"""Measure the OffsetDiversity grouped-warp tiers and single-flow warp tiers
head-to-head at 1080p with small (trained-regime) flows.

Variants:
  grouped_pallas_43   windowed kernel, d_v=43 (the out-of-window-safe default)
  grouped_pallas_3    windowed kernel, d_v=3 (small-flow window)
  grouped_shift_sum   (2b+2)^2-tap elementwise sum, b=2
  single_pallas_27 / single_pallas_3 / single_shift_sum : 48-ch single-flow
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1152, 1920
K = 5


def chain_time(fn, args, k=K):
    """Chained timing: feed output back (channel-matched) to serialize."""
    out = fn(*args)
    jax.block_until_ready(out)

    def chain(n):
        x = args[0]
        rest = args[1:]
        for _ in range(n):
            x = fn(x, *rest) * 0.5 + x * 0.5 if x.shape == out.shape else x + 0
        return float(np.asarray(jnp.sum(x[..., 0]) if x.ndim else x))

    # if shapes mismatch (grouped: 48 -> 96), mix back the first 48 channels
    def chain2(n):
        x = args[0]
        rest = args[1:]
        acc = jnp.zeros(())
        for _ in range(n):
            y = fn(x, *rest)
            x = 0.5 * x + 0.5 * y[..., : x.shape[-1]]
            acc = acc + jnp.sum(y[..., 0])
        return float(np.asarray(acc))

    chain2(1)
    t0 = time.time(); chain2(1); t1 = time.time() - t0
    t0 = time.time(); chain2(1 + k); tm = time.time() - t0
    return (tm - t1) / k


def main():
    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas, _flow_warp_pallas
    from lssvc_tpu.ops.warp import (flow_warp_shift_sum,
                                    grouped_warp_shift_sum)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.uniform(ks[0], (1, H, W, 48))
    fx = jax.random.uniform(ks[1], (1, H, W, 32), minval=-0.4, maxval=0.4)
    fy = jax.random.uniform(ks[2], (1, H, W, 32), minval=-0.4, maxval=0.4)
    mask = jax.random.uniform(ks[3], (1, H, W, 32))
    flow = jax.random.uniform(ks[4], (1, H, W, 2), minval=-0.4, maxval=0.4)

    which = sys.argv[1:] or ["grouped_pallas_43", "grouped_pallas_3",
                             "grouped_shift_sum", "single_pallas_27",
                             "single_pallas_3", "single_shift_sum"]

    for name in which:
        if name == "grouped_pallas_43":
            fn = jax.jit(lambda x_, fx_, fy_, m_: _grouped_warp_pallas(
                x_, fx_, fy_, m_, 43, 63, 16))
            args = (x, fx, fy, mask)
        elif name == "grouped_pallas_3":
            fn = jax.jit(lambda x_, fx_, fy_, m_: _grouped_warp_pallas(
                x_, fx_, fy_, m_, 3, 63, 16))
            args = (x, fx, fy, mask)
        elif name == "grouped_shift_sum":
            fn = jax.jit(lambda x_, fx_, fy_, m_: grouped_warp_shift_sum(
                x_, fx_, fy_, m_, 16, 2))
            args = (x, fx, fy, mask)
        elif name == "single_pallas_27":
            fn = jax.jit(lambda x_, f_: _flow_warp_pallas(
                x_, f_[..., 0], f_[..., 1], 27, 63))
            args = (x, flow)
        elif name == "single_pallas_3":
            fn = jax.jit(lambda x_, f_: _flow_warp_pallas(
                x_, f_[..., 0], f_[..., 1], 3, 63))
            args = (x, flow)
        elif name == "single_shift_sum":
            fn = jax.jit(lambda x_, f_: flow_warp_shift_sum(x_, f_, 2))
            args = (x, flow)
        elif name == "single_smallflow":
            from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_small

            fn = jax.jit(lambda x_, f_: _flow_warp_pallas_small(
                x_, f_[..., 0], f_[..., 1], 2, 3, 63))
            args = (x, flow)
        elif name == "single_cblock_27":
            # mid-tier window (b=d_v=27, dynamic tap loop): flows up to 26px
            from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

            flow27 = jax.random.uniform(ks[5], (1, H, W, 2), minval=-20.0,
                                        maxval=20.0)
            fn = jax.jit(lambda x_, f_: _flow_warp_pallas_cblock(
                x_, f_[..., 0], f_[..., 1], 27, 27, 63))
            args = (x, flow27)
        elif name == "single_cblock":
            from lssvc_tpu.ops.warp_pallas import _flow_warp_pallas_cblock

            fn = jax.jit(lambda x_, f_: _flow_warp_pallas_cblock(
                x_, f_[..., 0], f_[..., 1], 2, 3, 63))
            args = (x, flow)
        elif name == "grouped_cblock":
            from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_cblock

            fn = jax.jit(lambda x_, fx_, fy_, m_: _grouped_warp_pallas_cblock(
                x_, fx_, fy_, m_, 16, 2, 3, 63))
            args = (x, fx, fy, mask)
        elif name == "grouped_smallflow":
            from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_small

            fn = jax.jit(lambda x_, fx_, fy_, m_: _grouped_warp_pallas_small(
                x_, fx_, fy_, m_, 16, 2, 3, 63))
            args = (x, fx, fy, mask)
        else:
            raise ValueError(name)
        dt = chain_time(fn, args)
        print(f"{name:22s} {dt * 1000:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
