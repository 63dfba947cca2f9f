#!/usr/bin/env python
"""Fused conv-chain experiments for the full-res small-channel stacks.

The deep-core bisect (docs/PERFORMANCE.md) leaves the context/recon conv
stacks as the top conv cost after width-packing (~1.59x on C=48).  Two
further levers measured here:

  a) per-executable compiler options disabling XLA's space-to-batch
     rewrite (the env-flag route does not propagate through the axon
     compile helper, but `jit(f).lower(x).compile(compiler_options=...)`
     is per-executable and may);
  b) a Pallas fused conv-chain kernel (ops/conv_chain.py): the whole
     stack runs strip-by-strip in VMEM, one HBM read of the input and one
     write of the output instead of 2 round-trips per conv.

Usage: python tools/convchain_bench.py [--mode bf16] [--c 48] [--reps 4]
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


def bench_step(name, step, x0, k):
    return _bench_step(name, step, x0, k, width=52)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bf16")
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--c", type=int, default=48)
    ap.add_argument("--skip", default="",
                    help="comma list: plain,packed,nos2b,chain")
    ap.add_argument("--tr", type=int, default=None)
    args = ap.parse_args()
    skip = set(args.skip.split(","))

    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from lssvc_tpu.ops import conv2d, leaky_relu, set_precision_mode
    from lssvc_tpu.ops.packed import pack_kernel, pack_width, packed_conv2d, \
        unpack_width

    set_precision_mode(args.mode)
    key = jax.random.PRNGKey(0)
    reps, c = args.reps, args.c

    ks = jax.random.split(jax.random.fold_in(key, c), reps + 1)
    kerns = [jax.random.normal(ks[i], (3, 3, c, c)) * 0.05
             for i in range(reps)]
    x = jax.random.uniform(ks[-1], (1, H, W, c))

    def plain(x):
        y = x
        for kern in kerns:
            y = leaky_relu(conv2d(y, kern), 0.01)
        return y

    packed_kerns = [pack_kernel(np.asarray(kern), 2) for kern in kerns]

    def packed(x):
        y = pack_width(x, 2)
        for pw, pad in packed_kerns:
            y = leaky_relu(packed_conv2d(y, jnp.asarray(pw), pad_lr=pad),
                           0.01)
        return unpack_width(y, 2)

    if "plain" not in skip:
        bench_step(f"conv3x3 {c}ch x{reps} plain", jax.jit(plain), x, args.k)
    if "packed" not in skip:
        bench_step(f"conv3x3 {c}ch x{reps} packed", jax.jit(packed), x,
                   args.k)

    if "nos2b" not in skip:
        # per-executable compiler options: disable the space-to-batch pass
        for fname, f in (("plain", plain), ("packed", packed)):
            try:
                compiled = jax.jit(f).lower(x).compile(compiler_options={
                    "xla_disable_hlo_passes": "space-to-batch-converter"})
                bench_step(f"conv3x3 {c}ch x{reps} {fname}+no-s2b",
                           compiled, x, args.k)
            except Exception as e:
                print(f"no-s2b {fname}: FAILED ({type(e).__name__}: {e})",
                      flush=True)

    if "chain" not in skip:
        from lssvc_tpu.ops.conv_chain import conv_chain
        ws = [np.asarray(kern) for kern in kerns]
        cdt = jnp.bfloat16 if args.mode.startswith("bf16") else jnp.float32

        def chain(x):
            return conv_chain(x, ws, slopes=[0.01] * reps, cdtype=cdt,
                              tr=args.tr)

        y_ref = np.asarray(jax.jit(plain)(x), np.float32)
        y_got = np.asarray(jax.jit(chain)(x), np.float32)
        err = float(np.abs(y_ref - y_got).max())
        rel = err / max(1e-9, float(np.abs(y_ref).max()))
        print(f"chain max abs err vs plain: {err:.3e} (rel {rel:.3e})")
        bench_step(f"conv3x3 {c}ch x{reps} pallas-chain({cdt.__name__},"
                   f"tr={args.tr})", jax.jit(chain), x, args.k)


if __name__ == "__main__":
    main()
