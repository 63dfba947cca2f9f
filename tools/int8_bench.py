#!/usr/bin/env python
"""int8 MXU microbench — bounding the integer-inference lever (round 3).

The conv stacks measure ~1.2x their bf16 MXU-utilization floor
(docs/PERFORMANCE.md §conv-ceiling), which caps exact-parity
single-stream at ~4-6 fps/chip.  v5e's MXU runs int8 at 2x the bf16
peak (394 vs 197 TOPS), and DCVC-FM-style integer-ized inference is
also the named fix for cross-machine stream portability — so this
measures what an int8 serving path would actually buy on the
representative hot shape: the width-packed full-res conv stack
(p=2, C=48 -> packed C=96, 1080p EL).

Variants:
  bf16       packed conv stack, bf16 in/out (today's serving config)
  int8_conv  s8 x s8 -> s32 conv_general_dilated + per-layer requant
             (scale, clamp, cast back to s8 — the honest loop shape)
  int8_fx    s8 conv + ALL-INTEGER fixed-point requant (multiply+shift,
             ops/int8.py requant_fixed) — the chainable epilogue without
             the f32 scale/round pass
  int8_mm    tap-sum matmul formulation: a k-tap conv is k shifted
             (H*W, Cin) @ (Cin, Cout) int8 matmuls accumulated in s32
  int8_noreq int8_conv without requant (pure MXU+traffic bound)

Methodology: chained-dependency timing as bench.py (serial on device,
1-frame run subtracted).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

H, WP, C = 1152, 960, 96  # packed full-res EL domain (p=2, 1920/2, 2*48)
LAYERS = 4
K = 6


def chain_time(fn, x, k=K):
    jax.block_until_ready(fn(x))

    def chain(n):
        xx = x
        for _ in range(n):
            xx = fn(xx)
        return float(np.asarray(jnp.sum(xx[..., 0].astype(jnp.float32))))

    chain(1)
    best = None
    for _ in range(5):
        t0 = time.time(); chain(1); t1 = time.time() - t0
        t0 = time.time(); chain(1 + k); tm = time.time() - t0
        dt = (tm - t1) / k
        if best is not None and abs(dt - best) <= 0.1 * min(dt, best):
            return min(best, dt)
        best = dt if best is None else min(best, dt)
    return best


def main():
    from lssvc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
          for _ in range(LAYERS)]
    ws8 = [jnp.asarray(np.clip(np.round(np.asarray(w, np.float32) * 512),
                               -127, 127), jnp.int8) for w in ws]
    x16 = jnp.asarray(rng.standard_normal((1, H, WP, C)), jnp.bfloat16)
    x8 = jnp.asarray(np.clip(np.round(np.asarray(x16, np.float32) * 32),
                             -127, 127), jnp.int8)
    dn = jax.lax.conv_dimension_numbers((1, H, WP, C), (3, 3, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def f_bf16(x):
        for w in ws:
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            x = jnp.maximum(x, 0).astype(jnp.bfloat16)
        return x

    def _requant(acc):
        # per-tensor scale + relu + clamp back to s8 (VPU elementwise)
        y = jnp.maximum(acc, 0).astype(jnp.float32) * jnp.float32(2e-3)
        return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)

    @jax.jit
    def f_int8_conv(x):
        for w in ws8:
            acc = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            x = _requant(acc)
        return x

    @jax.jit
    def f_int8_noreq(x):
        accs = x
        for w in ws8:
            acc = jax.lax.conv_general_dilated(
                accs, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            accs = (acc >> 9).astype(jnp.int8)  # cheap shift requant
        return accs

    # all-integer fixed-point requant (ops/int8.py requant_fixed): the
    # honest chainable epilogue without the f32 scale/round pass
    from lssvc_tpu.ops.int8 import fixed_point_multiplier

    fx = []
    for w8 in ws8:
        M, post, ash = fixed_point_multiplier(
            1 / 32, np.full((C,), 2e-3 * 32, np.float64), 1.0,
            w_q=np.asarray(w8))
        fx.append((jnp.asarray(M), jnp.asarray(post), jnp.asarray(ash)))

    @jax.jit
    def f_int8_fx(x):
        from lssvc_tpu.ops.int8 import requant_fixed

        for w, (M, post, ash) in zip(ws8, fx):
            acc = jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            x = requant_fixed(acc, M, post, ash, relu=True)
        return x

    @jax.jit
    def f_int8_mm(x):
        for w in ws8:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((1, H, WP, C), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    seg = jax.lax.dynamic_slice(
                        xp, (0, dy, dx, 0), (1, H, WP, C))
                    acc = acc + jax.lax.dot_general(
                        seg.reshape(H * WP, C), w[dy, dx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).reshape(1, H, WP, C)
            x = _requant(acc)
        return x

    results = {}
    for name, fn, x in (("bf16", f_bf16, x16),
                        ("int8_conv", f_int8_conv, x8),
                        ("int8_fx", f_int8_fx, x8),
                        ("int8_noreq", f_int8_noreq, x8),
                        ("int8_mm", f_int8_mm, x8)):
        try:
            dt = chain_time(fn, x)
            results[name] = dt * 1e3
            print(f"{name:12s} {dt * 1e3:8.2f} ms  "
                  f"({LAYERS} layers, {H}x{WP}x{C})", flush=True)
        except Exception as e:  # noqa: BLE001 — record lowering failures
            results[name] = None
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
    if results.get("bf16") and results.get("int8_conv"):
        print(f"int8_conv speedup vs bf16: "
              f"{results['bf16'] / results['int8_conv']:.2f}x")
    if results.get("bf16") and results.get("int8_fx"):
        print(f"int8_fx   speedup vs bf16: "
              f"{results['bf16'] / results['int8_fx']:.2f}x")
    if results.get("bf16") and results.get("int8_mm"):
        print(f"int8_mm   speedup vs bf16: "
              f"{results['bf16'] / results['int8_mm']:.2f}x")


if __name__ == "__main__":
    main()
