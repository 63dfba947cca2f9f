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

    bl_hw = (el_hw[0] // 2, el_hw[1] // 2)
    params = init_lssvc(seed=0)
    if dtype != "float32":
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)

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

    args = (params, x_bl, x_el, ref_bl, ref_el, feat_bl, feat_el)
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    return 1.0 / dt


def main():
    try:
        fps = bench_two_layer()
        metric = "two_layer_1080p_fps_per_chip"
    except Exception:
        # fall back to 720p if the full-res graph doesn't fit
        import traceback

        traceback.print_exc()
        fps = bench_two_layer(el_hw=(768, 1280))
        metric = "two_layer_720p_fps_per_chip"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
