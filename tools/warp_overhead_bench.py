#!/usr/bin/env python
"""Quantify per-warp dispatch overheads at 1080p (round-2 warp follow-up).

The cblock kernel itself is at the Mosaic-expressible gather optimum
(docs/PERFORMANCE.md), so the remaining warp budget is boundary work:
bf16->f32 casts, the |flow| max-reductions driving the tier lax.conds,
and the NHWC<->planar transposes around the kernel.  Variants:

  direct      _flow_warp_pallas_cblock(x, fx, fy)        (kernel + planar)
  auto        flow_warp_auto(x, flow)                    (+casts/conds/max)
  auto_bf16   flow_warp_auto on bf16 input               (serving-mode real)
  planar      transpose->pad->untranspose identity       (boundary only)
  fmax        the two max-reductions alone
  dual        ONE 56-ch warp of concat([ref(3), f1(48)]) vs
  split       3-ch warp + 48-ch warp with the same flow  (fusion candidate)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1152, 1920
K = 6


def chain_time(fn, x, rest, k=K, feedback=None):
    """feedback(xx, y) -> next xx; default assumes y's leading channels
    are layout-compatible with xx (packed-output variants pass their own)."""
    out = fn(x, *rest)
    jax.block_until_ready(out)
    if feedback is None:
        def feedback(xx, y):
            return (0.5 * xx + 0.5 * y[..., : xx.shape[-1]]).astype(xx.dtype)

    def chain(n):
        xx = x
        acc = jnp.zeros(())
        for _ in range(n):
            y = fn(xx, *rest)
            xx = feedback(xx, y)
            acc = acc + jnp.sum(y[..., 0].astype(jnp.float32))
        return float(np.asarray(acc))

    chain(1)
    best = None
    for _ in range(5):
        t0 = time.time(); chain(1); t1 = time.time() - t0
        t0 = time.time(); chain(1 + k); tm = time.time() - t0
        dt = (tm - t1) / k
        if best is not None and abs(dt - best) <= 0.1 * min(dt, best):
            best = min(best, dt)
            break
        best = dt if best is None else min(best, dt)
    return best


def main():
    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from lssvc_tpu.ops.warp_pallas import (
        _flow_warp_pallas_cblock, flow_warp_auto)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.uniform(ks[0], (1, H, W, 48))
    x3 = jax.random.uniform(ks[3], (1, H, W, 3))
    flow = jax.random.uniform(ks[1], (1, H, W, 2), minval=-0.4, maxval=0.4)

    which = sys.argv[1:] or ["direct", "auto", "auto_bf16", "planar",
                             "fmax", "dual", "split"]
    for name in which:
        if name == "direct":
            fn = jax.jit(lambda x_, f_: _flow_warp_pallas_cblock(
                x_, f_[..., 0], f_[..., 1], 2, 3, 63))
            dt = chain_time(fn, x, (flow,))
        elif name == "auto":
            fn = jax.jit(lambda x_, f_: flow_warp_auto(x_, f_))
            dt = chain_time(fn, x, (flow,))
        elif name == "auto_bf16":
            fn = jax.jit(lambda x_, f_: flow_warp_auto(x_, f_).astype(
                jnp.bfloat16))
            dt = chain_time(fn, x.astype(jnp.bfloat16),
                            (flow.astype(jnp.bfloat16),))
        elif name == "planar":
            def planar_rt(x_, f_):
                p = jnp.transpose(x_[0], (0, 2, 1))
                p = jnp.pad(p, ((4, 12), (0, 0), (64, 192)))
                q = jnp.transpose(p, (0, 2, 1))
                return q[None, 0:H, 64:64 + W, :]

            fn = jax.jit(planar_rt)
            dt = chain_time(fn, x, (flow,))
        elif name == "fmax":
            def fmax_fn(x_, f_):
                fx, fy = f_[..., 0], f_[..., 1]
                m = jnp.maximum(jnp.max(jnp.abs(fx)), jnp.max(jnp.abs(fy)))
                return x_ + 0.0 * m

            fn = jax.jit(fmax_fn)
            dt = chain_time(fn, x, (flow,))
        elif name == "dual":
            def dual(x_, f_):
                cat = jnp.concatenate([x_, jnp.tile(x_[..., :3], (1, 1, 1, 1))
                                       ], axis=-1)[..., :51]
                return _flow_warp_pallas_cblock(cat, f_[..., 0], f_[..., 1],
                                                2, 3, 63)

            fn = jax.jit(dual)
            dt = chain_time(fn, x, (flow,))
        elif name == "split":
            def split(x_, f_):
                a = _flow_warp_pallas_cblock(x_, f_[..., 0], f_[..., 1],
                                             2, 3, 63)
                b = _flow_warp_pallas_cblock(x_[..., :3], f_[..., 0],
                                             f_[..., 1], 2, 3, 63)
                return jnp.concatenate([a, b], axis=-1)

            fn = jax.jit(split)
            dt = chain_time(fn, x, (flow,))
        elif name in ("pack_after", "packed_out"):
            # the packed-consumer boundary A/B: NHWC store + XLA
            # pack_width relayout vs the kernel's fused packed store
            # (chain feedback reads the first 48 packed channels, which
            # is phase-0 — fine for timing, both variants identical)
            from lssvc_tpu.ops.packed import pack_width

            if name == "pack_after":
                def fnb(x_, f_):
                    return pack_width(_flow_warp_pallas_cblock(
                        x_, f_[..., 0], f_[..., 1], 2, 3, 63), 2)
            else:
                def fnb(x_, f_):
                    return _flow_warp_pallas_cblock(
                        x_, f_[..., 0], f_[..., 1], 2, 3, 63,
                        packed_out=True)

            def fb(xx, y):  # identical for both variants (A/B-fair)
                from lssvc_tpu.ops.packed import unpack_width

                return (0.5 * xx + 0.5 * unpack_width(y, 2)).astype(xx.dtype)

            fn = jax.jit(fnb)
            dt = chain_time(fn, x.astype(jnp.bfloat16),
                            (flow.astype(jnp.bfloat16),), feedback=fb)
        elif name in ("grouped_pack_after", "grouped_packed_out"):
            # OffsetDiversity-shaped grouped warp (96ch block layout)
            from lssvc_tpu.ops.packed import pack_width, unpack_width
            from lssvc_tpu.ops.warp_pallas import _grouped_warp_pallas_cblock

            gk = jax.random.split(jax.random.PRNGKey(7), 3)
            go = 32
            fxg = jax.random.uniform(gk[0], (1, H, W, go), minval=-0.4,
                                     maxval=0.4).astype(jnp.bfloat16)
            fyg = jax.random.uniform(gk[1], (1, H, W, go), minval=-0.4,
                                     maxval=0.4).astype(jnp.bfloat16)
            mg = jax.random.uniform(gk[2], (1, H, W, go)
                                    ).astype(jnp.bfloat16)
            packed = name == "grouped_packed_out"

            def fng(x_, fx_, fy_, m_):
                out = _grouped_warp_pallas_cblock(x_, fx_, fy_, m_, 16,
                                                  2, 3, 63,
                                                  packed_out=packed)
                return out if packed else pack_width(out, 2)

            def fbg(xx, y):
                return (0.5 * xx
                        + 0.5 * unpack_width(y, 2)[..., :xx.shape[-1]]
                        ).astype(xx.dtype)

            fn = jax.jit(fng)
            dt = chain_time(fn, x.astype(jnp.bfloat16), (fxg, fyg, mg),
                            feedback=fbg)
        else:
            print(f"unknown {name}"); continue
        print(f"{name:12s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
