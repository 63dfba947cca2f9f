#!/usr/bin/env python
"""Width-packed conv domain microbench at 1080p (tools for round-2 item #2).

Measures the hot full-res small-channel conv shapes unpacked vs width-packed
(p=2): C=48 (pads 48->128, 2.7x) and C=64 (pads 64->128, 2x).  Chained-
dependency timing, 1-iter baseline subtracted, re-measured until two
consecutive readings agree within 10% (docs/PERFORMANCE.md methodology).

Usage: python tools/packbench.py [--mode bf16] [--k 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1152, 1920


from tools.measure import bench_step as _bench_step


def bench_stack(name, step, x0, k):
    return _bench_step(name, step, x0, k, width=46)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bf16")
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--reps", type=int, default=4,
                    help="convs per chained step")
    args = ap.parse_args()

    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from lssvc_tpu.ops import conv2d, leaky_relu, set_precision_mode
    from lssvc_tpu.ops.packed import (
        pack_kernel, pack_width, packed_conv2d, unpack_width)

    set_precision_mode(args.mode)
    key = jax.random.PRNGKey(0)
    reps = args.reps

    for c in (48, 64, 96):
        ks = jax.random.split(jax.random.fold_in(key, c), reps + 1)
        kerns = [jax.random.normal(ks[i], (3, 3, c, c)) * 0.05
                 for i in range(reps)]
        x = jax.random.uniform(ks[-1], (1, H, W, c))

        @jax.jit
        def plain(x, kerns=kerns):
            y = x
            for kern in kerns:
                y = leaky_relu(conv2d(y, kern), 0.01)
            return y

        packed_kerns = [pack_kernel(np.asarray(kern), 2) for kern in kerns]

        @jax.jit
        def packed(x, pk=packed_kerns):
            y = pack_width(x, 2)
            for pw, pad in pk:
                y = leaky_relu(packed_conv2d(y, jnp.asarray(pw), pad_lr=pad),
                               0.01)
            return unpack_width(y, 2)

        @jax.jit
        def packed_noboundary(xp, pk=packed_kerns):
            y = xp
            for pw, pad in pk:
                y = leaky_relu(packed_conv2d(y, jnp.asarray(pw), pad_lr=pad),
                               0.01)
            return y

        t_plain = bench_stack(f"conv3x3 {c}ch x{reps} plain", plain, x, args.k)
        t_packed = bench_stack(f"conv3x3 {c}ch x{reps} packed(+bounds)",
                               packed, x, args.k)
        xp0 = jax.jit(lambda x: pack_width(x, 2))(x)
        t_nb = bench_stack(f"conv3x3 {c}ch x{reps} packed(core)",
                           packed_noboundary, xp0, args.k)
        print(f"  -> speedup with bounds {t_plain / t_packed:5.2f}x, "
              f"core {t_plain / t_nb:5.2f}x", flush=True)

    # numerics sanity on-chip (fp32 would be exact; bf16 just close)
    c = 48
    kern = jax.random.normal(key, (3, 3, c, c)) * 0.05
    x = jax.random.uniform(key, (1, 64, 128, c))
    ref = np.asarray(conv2d(x, kern))
    pw, pad = pack_kernel(np.asarray(kern), 2)
    got = np.asarray(unpack_width(
        packed_conv2d(pack_width(x, 2), jnp.asarray(pw), pad_lr=pad), 2))
    err = float(np.abs(ref.astype(np.float32) - got.astype(np.float32)).max())
    print(f"max |plain - packed| on-chip: {err:.3e}")


if __name__ == "__main__":
    main()
