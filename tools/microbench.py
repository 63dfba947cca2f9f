#!/usr/bin/env python
"""Component micro-benchmarks at 1080p with chained-dependency timing.

Each component runs `iters` times with a data dependence threaded through
(input perturbed by 0 * f(previous output)), then ONE scalar transfer — so
the wall-clock measures serial device execution regardless of remote-tunnel
async/blocking semantics.  The 1-iteration baseline is subtracted to cancel
fixed overheads.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lssvc_tpu.convert import P
from lssvc_tpu.models.components import me_spynet, unet, feature_extractor_3scale
from lssvc_tpu.models.init import init_lssvc
from lssvc_tpu.models.lssvc_blocks import el_res_encoder, offset_diversity
from lssvc_tpu.ops import (
    bilinear_resize, conv2d, flow_warp, flow_warp_grouped, set_compute_dtype,
)

H, W = 1152, 1920
key = jax.random.PRNGKey(0)
params = init_lssvc(0)


def chain_run(f, x0, others, n):
    eps = jnp.zeros(())
    for _ in range(n):
        out = f(x0 + eps, *others)
        leaf = jax.tree.leaves(out)[0]
        eps = 0.0 * jnp.sum(leaf[(0,) * (leaf.ndim - 1)][..., :1])
    return float(np.asarray(eps))


def timeit(name, fn, x0, *others, iters=4):
    f = jax.jit(fn)
    chain_run(f, x0, others, 1)  # compile + warm
    t0 = time.time()
    chain_run(f, x0, others, 1)
    t1 = time.time() - t0
    t0 = time.time()
    chain_run(f, x0, others, 1 + iters)
    t_many = time.time() - t0
    dt = (t_many - t1) / iters * 1000
    print(f"{name:44s} {dt:10.1f} ms", flush=True)
    return dt


def main(dtype="float32"):
    set_compute_dtype(dtype)
    print(f"=== compute dtype {dtype} ===", flush=True)
    ks = jax.random.split(key, 8)
    x48 = jax.random.uniform(ks[0], (1, H, W, 48))
    x96 = jax.random.uniform(ks[1], (1, H, W, 96))
    rgb = jax.random.uniform(ks[2], (1, H, W, 3))
    rgb2 = jax.random.uniform(ks[3], (1, H, W, 3))
    flow = jax.random.uniform(ks[4], (1, H, W, 2)) * 8
    flow32 = jax.random.uniform(ks[5], (1, H, W, 32)) * 8
    half64 = jax.random.uniform(ks[6], (1, H // 2, W // 2, 64))
    w7 = jax.random.normal(ks[7], (7, 7, 8, 32)) * 0.05
    cat8 = jnp.concatenate([rgb, rgb2, flow], axis=-1)

    timeit("conv 7x7 8->32 @1080p", lambda a, w: conv2d(a, w), cat8, w7)
    timeit("conv 3x3 48->48 @1080p",
           lambda a, w: conv2d(a, w),
           x48, jax.random.normal(key, (3, 3, 48, 48)) * 0.05)
    timeit("flow_warp 3ch @1080p", flow_warp, rgb, flow)
    timeit("flow_warp 48ch @1080p", flow_warp, x48, flow)
    timeit("flow_warp_grouped 96ch/32g @1080p",
           flow_warp_grouped, x96, flow32, flow32)
    timeit("bilinear_resize 64ch 540p->1080p",
           lambda a: bilinear_resize(a, (H, W)), half64)
    timeit("spynet @1080p",
           lambda a, b, p: me_spynet(P(p), a, b),
           rgb, rgb2,
           {k[len("optic_flow."):]: v for k, v in params.items()
            if k.startswith("optic_flow.")})
    timeit("unet 48ch @1080p",
           lambda a, p: unet(P(p, "recon_generation_net.unet_1."), a),
           x48, params)
    timeit("el_res_encoder @1080p",
           lambda a, p, c1, c2, c3: el_res_encoder(P(p, "res_encoder."), a,
                                                   c1, c2, c3),
           rgb, params, x48,
           jax.random.uniform(key, (1, H // 2, W // 2, 64)),
           jax.random.uniform(key, (1, H // 4, W // 4, 96)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "float32")
