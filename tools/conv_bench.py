#!/usr/bin/env python
"""Micro-benchmark a representative batch-1 conv stack at 1080p to test
whether TPU compiler flags (LIBTPU_INIT_ARGS) propagate through the axon
tunnel and whether XLA's space-to-batch rewrite helps or hurts here.

Usage:
  python tools/conv_bench.py                 # default flags
  LIBTPU_INIT_ARGS=--xla_tpu_run_space_to_batch=false python tools/conv_bench.py
  python tools/conv_bench.py --batch 4       # batched variant
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--hw", type=int, nargs=2, default=(1152, 1920))
    ap.add_argument("--mode", default="bf16")
    ap.add_argument("--impl", default="conv",
                    choices=["conv", "einsum", "mixed"])
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()

    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from lssvc_tpu.ops import set_precision_mode, conv2d, leaky_relu
    set_precision_mode(args.mode)

    h, w = args.hw
    b = args.batch
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    # a DepthConvBlock-shaped stack at 48ch full-res (the EL hot shape):
    # 1x1 48->48, dw 3x3, 1x1 48->48, 1x1 48->192, 1x1 192->48
    w1 = jax.random.normal(ks[0], (1, 1, 48, 48)) * 0.05
    wd = jax.random.normal(ks[1], (3, 3, 1, 48)) * 0.05
    w2 = jax.random.normal(ks[2], (1, 1, 48, 48)) * 0.05
    w3 = jax.random.normal(ks[3], (1, 1, 48, 192)) * 0.05
    w4 = jax.random.normal(ks[4], (1, 1, 192, 48)) * 0.05
    w5 = jax.random.normal(ks[5], (3, 3, 48, 48)) * 0.05

    if args.impl == "mixed":
        dt = jnp.bfloat16 if args.mode == "bf16" else jnp.float32

        def mm(x, wmat):
            return jnp.einsum(
                "bhwc,co->bhwo", x.astype(dt), wmat.astype(dt),
                preferred_element_type=jnp.float32)

        @jax.jit
        def step(x):
            y = mm(x, w1[0, 0])
            y = leaky_relu(y, 0.01)
            y = conv2d(y, wd, groups=48)
            y = mm(y, w2[0, 0])
            y = x + y
            z = mm(y, w3[0, 0])
            z = leaky_relu(z, 0.1)
            z = mm(z, w4[0, 0])
            y = y + z
            y = conv2d(y, w5)
            return leaky_relu(y, 0.01)
    elif args.impl == "einsum":
        from jax import lax

        dt = jnp.bfloat16 if args.mode == "bf16" else jnp.float32

        def mm(x, wmat):
            return jnp.einsum(
                "bhwc,co->bhwo", x.astype(dt), wmat.astype(dt),
                preferred_element_type=jnp.float32)

        def shift(x, dy, dx):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            return lax.dynamic_slice(
                xp, (0, 1 + dy, 1 + dx, 0), x.shape)

        def conv3x3(x, w):  # w: (3,3,C,O) as 9-tap matmul accumulation
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    t = mm(shift(x, dy, dx), w[1 + dy, 1 + dx])
                    acc = t if acc is None else acc + t
            return acc

        def dw3x3(x, w):  # w: (3,3,1,C) depthwise as 9 shifted muls
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    t = shift(x, dy, dx) * w[1 + dy, 1 + dx, 0]
                    acc = t if acc is None else acc + t
            return acc

        @jax.jit
        def step(x):
            y = mm(x, w1[0, 0])
            y = leaky_relu(y, 0.01)
            y = dw3x3(y, wd)
            y = mm(y, w2[0, 0])
            y = x + y
            z = mm(y, w3[0, 0])
            z = leaky_relu(z, 0.1)
            z = mm(z, w4[0, 0])
            y = y + z
            y = conv3x3(y, w5)
            return leaky_relu(y, 0.01)
    else:
        @jax.jit
        def step(x):
            y = conv2d(x, w1)
            y = leaky_relu(y, 0.01)
            y = conv2d(y, wd, groups=48)
            y = conv2d(y, w2)
            y = x + y
            z = conv2d(y, w3)
            z = leaky_relu(z, 0.1)
            z = conv2d(z, w4)
            y = y + z
            y = conv2d(y, w5)
            return leaky_relu(y, 0.01)

    x = jax.random.uniform(ks[6], (b, h, w, 48))

    def chain(n):
        y = x
        for _ in range(n):
            y = step(y)
        return float(np.asarray(jnp.sum(y[..., 0])))

    chain(1)
    t0 = time.time(); chain(1); t1 = time.time() - t0
    t0 = time.time(); chain(1 + args.k); tm = time.time() - t0
    dt = (tm - t1) / args.k
    flops = b * h * w * (48 * 48 * 3 + 9 * 48 + 48 * 192 * 2 + 9 * 48 * 48) * 2
    print(f"batch={b} {dt * 1000:8.2f} ms/iter  "
          f"{flops / dt / 1e12:6.2f} TFLOP/s  "
          f"(LIBTPU_INIT_ARGS={os.environ.get('LIBTPU_INIT_ARGS', '')!r})")


if __name__ == "__main__":
    main()
