#!/usr/bin/env python
"""Benchmark: two-layer 1080p+540p P-frame coding throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: K sequential two-layer frame forwards chained inside one
compiled program (`lax.scan`, DPB fed back — the codec's real dependency
structure), scalar output.  Wall-clock of the scalar fetch is dominated by
K frames of device compute; this sidesteps remote-execution timing
artifacts (early-returning block_until_ready, slow host transfers of frame
outputs).

The forward computes encoder AND decoder network math + bit estimation
(BL DMC + EL LSSVC: SpyNet ME, MV/residual AEs, OffsetDiversity context,
four-part prior, reconstruction).

Baseline: the reference reports ~1.44 s encode + ~1.35 s decode per
two-layer 1080p P-frame (BASELINE.md) => 0.358 fps enc+dec.
"""

import json
import time

BASELINE_FPS = 1.0 / (1.44 + 1.35)


def bench_chain(el_hw=(1152, 1920), k=8, dtype="float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lssvc_tpu.models import lssvc as lssvc_model
    from lssvc_tpu.models.init import init_lssvc
    from lssvc_tpu.ops import set_compute_dtype

    set_compute_dtype(dtype)
    params = init_lssvc(0)
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
        _, bits = jax.lax.scan(step, dpb0, (x_bl_seq, x_el_seq))
        return jnp.sum(bits)

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    args = (
        params,
        jax.random.uniform(ks[0], (k, 1, *bl_hw, 3)),
        jax.random.uniform(ks[1], (k, 1, *el_hw, 3)),
        {
            "ref_frame_bl": jax.random.uniform(ks[2], (1, *bl_hw, 3)),
            "ref_frame_el": jax.random.uniform(ks[3], (1, *el_hw, 3)),
            "ref_feature_bl": jax.random.uniform(ks[4], (1, *bl_hw, 64)),
            "ref_feature_el": jax.random.uniform(ks[5], (1, *el_hw, 48)),
        },
    )
    float(np.asarray(chain(*args)))  # compile + warm
    t0 = time.time()
    float(np.asarray(chain(*args)))
    dt = (time.time() - t0) / k
    return 1.0 / dt


def main():
    import traceback

    fps = None
    metric = None
    for el_hw, tag in (((1152, 1920), "1080p"), ((768, 1280), "720p")):
        try:
            fps = bench_chain(el_hw=el_hw)
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
