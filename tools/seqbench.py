#!/usr/bin/env python
"""Sequential-frame device benchmark: K chained two-layer P-frame forwards
inside ONE compiled program (DPB fed back through lax.scan), scalar output.

This sidesteps remote-tunnel timing artifacts (early-returning
block_until_ready, slow host transfers): the wall-clock between submitting
the program and receiving the scalar is dominated by K frames of device
compute, exactly like the real codec loop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lssvc_tpu.models import lssvc as lssvc_model
from lssvc_tpu.models.init import init_lssvc
from lssvc_tpu.ops import set_compute_dtype


def make_chain(params, el_hw, k):
    bl_hw = (el_hw[0] // 2, el_hw[1] // 2)
    shape_hr = el_hw

    def step(dpb, xs):
        x_bl, x_el = xs
        out = lssvc_model.forward_one_frame(
            params, x_bl, x_el, dpb["ref_frame_bl"], dpb["ref_frame_el"],
            dpb["ref_feature_bl"], dpb["ref_feature_el"],
            shape_hr, 2.0, (0, 0, 0, 0))
        return out["dpb"], out["bit_bl"] + out["bit_el"]

    @jax.jit
    def chain(params, x_bl_seq, x_el_seq, dpb0):
        dpb, bits = jax.lax.scan(step, dpb0, (x_bl_seq, x_el_seq))
        return jnp.sum(bits)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x_bl_seq = jax.random.uniform(ks[0], (k, 1, *bl_hw, 3))
    x_el_seq = jax.random.uniform(ks[1], (k, 1, *el_hw, 3))
    dpb0 = {
        "ref_frame_bl": jax.random.uniform(ks[2], (1, *bl_hw, 3)),
        "ref_frame_el": jax.random.uniform(ks[3], (1, *el_hw, 3)),
        "ref_feature_bl": jax.random.uniform(ks[4], (1, *bl_hw, 64)),
        "ref_feature_el": jax.random.uniform(ks[5], (1, *el_hw, 48)),
    }
    return chain, (params, x_bl_seq, x_el_seq, dpb0)


def run(el_hw=(1152, 1920), k=8, dtype="float32"):
    import numpy as np

    set_compute_dtype(dtype)
    params = init_lssvc(0)
    chain, args = make_chain(params, el_hw, k)
    # warmup (includes compile)
    t0 = time.time()
    v = float(np.asarray(chain(*args)))
    t_first = time.time() - t0
    # steady state
    t0 = time.time()
    v = float(np.asarray(chain(*args)))
    dt = time.time() - t0
    per_frame = dt / k
    print(f"el={el_hw} k={k} dtype={dtype}: first={t_first:.1f}s "
          f"steady={dt:.2f}s -> {per_frame * 1000:.1f} ms/frame "
          f"({1 / per_frame:.2f} fps), bits={v:.0f}")
    return 1 / per_frame


if __name__ == "__main__":
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    hw = (1152, 1920)
    if len(sys.argv) > 2 and sys.argv[2] == "720p":
        hw = (768, 1280)
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    run(hw, k, dtype)
