#!/usr/bin/env python
"""Component micro-benchmarks at 1080p on the attached accelerator."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lssvc_tpu.convert import P
from lssvc_tpu.models import lssvc as lssvc_model
from lssvc_tpu.models.components import me_spynet, unet, feature_extractor_3scale
from lssvc_tpu.models.init import init_lssvc
from lssvc_tpu.models.lssvc_blocks import el_res_encoder, offset_diversity
from lssvc_tpu.ops import (
    bilinear_resize, conv2d, flow_warp, flow_warp_grouped, set_compute_dtype,
)

H, W = 1152, 1920
key = jax.random.PRNGKey(0)
params = init_lssvc(0)


def _sync(out):
    """Force real completion: a host transfer cannot finish early (axon's
    block_until_ready returns before device execution completes)."""
    leaf = jax.tree.leaves(out)[0]
    import numpy as _np

    return _np.asarray(leaf).ravel()[0]


def timeit(name, fn, *args, iters=3):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.time()
    for _ in range(iters):
        _sync(f(*args))
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:40s} {dt:10.1f} ms")
    return dt


def main(dtype="float32"):
    set_compute_dtype(dtype)
    print(f"=== compute dtype {dtype} ===")
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
    timeit("flow_warp 3ch @1080p", flow_warp, rgb, flow)
    timeit("flow_warp 48ch @1080p", flow_warp, x48, flow)
    timeit("flow_warp_grouped 96ch/32g @1080p",
           flow_warp_grouped, x96, flow32, flow32)
    timeit("bilinear_resize 64ch 540p->1080p",
           lambda a: bilinear_resize(a, (H, W)), half64)
    timeit("spynet @1080p",
           lambda p, a, b: me_spynet(P(p), a, b),
           {k[len("optic_flow."):]: v for k, v in params.items()
            if k.startswith("optic_flow.")}, rgb, rgb2)
    timeit("unet 48ch @1080p",
           lambda p, a: unet(P(p, "recon_generation_net.unet_1."), a), params,
           x48)
    timeit("el_res_encoder @1080p",
           lambda p, a, c1, c2, c3: el_res_encoder(P(p, "res_encoder."), a,
                                                   c1, c2, c3),
           params, rgb, x48,
           jax.random.uniform(key, (1, H // 2, W // 2, 64)),
           jax.random.uniform(key, (1, H // 4, W // 4, 96)))


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "float32")
