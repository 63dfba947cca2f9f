#!/usr/bin/env python
"""Benchmark: two-layer 1080p+540p P-frame coding throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full two-layer forward (BL DMC + EL LSSVC: motion estimation,
MV+residual analysis/synthesis, four-part prior, reconstruction and bit
estimation — i.e. encoder AND decoder network math) on padded 1080p
(1152x1920 EL / 576x960 BL), steady-state, on the attached accelerator.

Baseline: the reference's authors report ~1.44 s encode + ~1.35 s decode
per two-layer 1080p P-frame (BASELINE.md) => 0.358 fps enc+dec.
"""

import json
import time

BASELINE_FPS = 1.0 / (1.44 + 1.35)


def bench_two_layer(el_hw=(1152, 1920), warmup=2, iters=5, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from lssvc_tpu.models import lssvc as lssvc_model
    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.ops import set_compute_dtype

    set_compute_dtype(dtype)
    bl_hw = (el_hw[0] // 2, el_hw[1] // 2)
    params = init_lssvc(seed=0)

    shape_hr = el_hw

    def fn(params, x_bl, x_el, ref_bl, ref_el, feat_bl, feat_el):
        out = lssvc_model.forward_one_frame(
            params, x_bl, x_el, ref_bl, ref_el, feat_bl, feat_el,
            shape_hr, 2.0, (0, 0, 0, 0))
        return (out["dpb"]["ref_frame_el"], out["dpb"]["ref_frame_bl"],
                out["dpb"]["ref_feature_el"], out["dpb"]["ref_feature_bl"],
                out["bit_bl"] + out["bit_el"])

    fn = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    x_bl = jax.random.uniform(ks[0], (1, *bl_hw, 3))
    x_el = jax.random.uniform(ks[1], (1, *el_hw, 3))
    ref_bl = jax.random.uniform(ks[2], (1, *bl_hw, 3))
    ref_el = jax.random.uniform(ks[3], (1, *el_hw, 3))
    feat_bl = jax.random.uniform(ks[4], (1, *bl_hw, 64))
    feat_el = jax.random.uniform(ks[5], (1, *el_hw, 48))

    import numpy as np

    def sync(out):
        # force true completion: a host transfer cannot complete before the
        # device program does (block_until_ready alone can return early
        # through remote-execution tunnels)
        return float(np.asarray(out[-1]))

    args = (params, x_bl, x_el, ref_bl, ref_el, feat_bl, feat_el)
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        sync(fn(*args))
    dt = (time.time() - t0) / iters
    return 1.0 / dt


def main():
    import traceback

    fps = None
    metric = None
    for el_hw, tag in (((1152, 1920), "1080p"), ((768, 1280), "720p")):
        try:
            fps = bench_two_layer(el_hw=el_hw)
            metric = f"two_layer_{tag}_fps_per_chip"
            break
        except Exception:
            traceback.print_exc()
    if fps is None:
        raise SystemExit("bench failed at all resolutions")
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
