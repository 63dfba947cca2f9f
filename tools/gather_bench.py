#!/usr/bin/env python
"""Benchmark warp-gather formulations at 1080p (48 channels, 4 corners).

Chained-dependency timing (output feeds next input's perturbation), one
scalar fetch at the end.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lssvc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

H, W, C = 1152, 1920, 48
HW = H * W


def corners(flow):
    iy = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    ix = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    px = jnp.clip(ix + flow[..., 0], 0.0, W - 1.0)
    py = jnp.clip(iy + flow[..., 1], 0.0, H - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    return x0, x1, y0, y1, wx, wy


def warp_take_rows(x, flow):
    """Current implementation: 4 x jnp.take over (HW, C) rows."""
    x0, x1, y0, y1, wx, wy = corners(flow)
    flat = x.reshape(HW, C)

    def g(yy, xx):
        return jnp.take(flat, (yy * W + xx).reshape(-1), axis=0).reshape(1, H, W, C)

    v00, v01, v10, v11 = g(y0, x0), g(y0, x1), g(y1, x0), g(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy


def warp_span2(x, flow):
    """2 gathers of (1, 2C) spans: (x0, x0+1) are adjacent rows of (HW, C);
    border x0=W-1 fetches a junk second element with zero weight."""
    x0, x1, y0, y1, wx, wy = corners(flow)
    # pad one junk row so the (HW-1)-th start's 2C-span stays in bounds
    # (the junk values only land on zero-weight corners)
    flat = jnp.concatenate([x.reshape(HW * C), jnp.zeros(C, x.dtype)])

    def g2(yy):
        starts = ((yy * W + x0) * C).reshape(-1, 1)
        out = jax.lax.gather(
            flat[:, None],
            starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(1,),
                start_index_map=(0,)),
            slice_sizes=(2 * C, 1),
            mode="clip")
        return out.reshape(1, H, W, 2, C)

    s0 = g2(y0)  # (.., 2, C): [v00, v01]
    s1 = g2(y1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = s0[..., 0, :] * (1 - wx) + s0[..., 1, :] * wx
    bot = s1[..., 0, :] * (1 - wx) + s1[..., 1, :] * wx
    return top * (1 - wy) + bot * wy


def warp_take_rows_bf16(x, flow):
    return warp_take_rows(x.astype(jnp.bfloat16), flow).astype(jnp.float32)


def warp_take_along(x, flow):
    x0, x1, y0, y1, wx, wy = corners(flow)
    flat = x.reshape(1, HW, C)

    def g(yy, xx):
        idx = (yy * W + xx).reshape(1, HW, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(1, H, W, C)

    v00, v01, v10, v11 = g(y0, x0), g(y0, x1), g(y1, x0), g(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy


def warp_dynamic_slice_rows(x, flow):
    """Vertical: per-output-row loop gathering 2 source rows per pixel is not
    expressible; instead: gather with sorted indices + unsort."""
    x0, x1, y0, y1, wx, wy = corners(flow)
    flat = x.reshape(HW, C)

    def g(yy, xx):
        idx = (yy * W + xx).reshape(-1)
        order = jnp.argsort(idx)
        inv = jnp.argsort(order)
        sorted_vals = jnp.take(flat, idx[order], axis=0)
        return jnp.take(sorted_vals, inv, axis=0).reshape(1, H, W, C)

    v00, v01, v10, v11 = g(y0, x0), g(y0, x1), g(y1, x0), g(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy


def timeit(name, fn, iters=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(k1, (1, H, W, C))
    flow = jax.random.uniform(k2, (1, H, W, 2)) * 9 - 4.5
    f = jax.jit(fn)

    def chain(n):
        eps = jnp.zeros(())
        for _ in range(n):
            out = f(x + eps, flow)
            eps = 0.0 * jnp.sum(out[0, 0, 0, :1])
        return float(np.asarray(eps))

    chain(1)
    t0 = time.time()
    chain(1)
    t1 = time.time() - t0
    t0 = time.time()
    chain(1 + iters)
    dt = (time.time() - t0 - t1) / iters * 1000
    print(f"{name:28s} {dt:9.1f} ms", flush=True)


def check_correctness():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.uniform(k1, (1, 64, 96, 8))
    flow = jax.random.uniform(k2, (1, 64, 96, 2)) * 9 - 4.5
    global H, W, C, HW
    H0, W0, C0 = H, W, C
    H, W, C = 64, 96, 8
    HW = H * W
    ref = np.asarray(warp_take_rows(x, flow))
    for name, fn in (("span2", warp_span2), ("take_along", warp_take_along)):
        got = np.asarray(fn(x, flow))
        err = np.abs(got - ref).max()
        print(f"correctness {name}: max err {err:.2e}")
    H, W, C = H0, W0, C0
    HW = H * W


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check_correctness()
    else:
        timeit("take_rows (current)", warp_take_rows)
        timeit("take_along_axis", warp_take_along)
        timeit("span2_gather", warp_span2)
        timeit("take_rows bf16", warp_take_rows_bf16)
        timeit("sorted+unsort", warp_dynamic_slice_rows)
