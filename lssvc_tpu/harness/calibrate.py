"""int8 activation calibration for the two-layer video forward.

Produces the {shape-qualified scope prefix: activation scale} table that
`set_precision_mode("int8")` serves from (ops/int8.py).  Calibration runs
the width-packed bf16 forward under the trace-time absmax recorder over a
few chained synthetic-motion frames — per-tensor scales are effectively
shape-independent, so a half/quarter-resolution run calibrates 1080p
serving.

Scales are TRACE-TIME CONSTANTS: any jitted executable built while a
table was installed bakes those scales in.  Callers that swap tables
(per-checkpoint eval, tools/rd_experiment.py) must clear jit caches
between tables or stale scales are silently served.
"""

from __future__ import annotations

import numpy as np


def synthetic_frames(hw, n_frames, seed=7):
    """Smooth texture + global pan + a moving square (bench.py's recipe,
    self-contained so the package does not import the top-level bench)."""
    h, w = hw
    rng = np.random.default_rng(seed)
    small = rng.random((h // 16 + 2, w // 16 + 2, 3)).astype(np.float32)
    base = np.repeat(np.repeat(small, 16, axis=0), 16, axis=1)[:h, :w]
    sq = h // 8
    out = []
    for t in range(n_frames):
        f = np.roll(base, (int(1.5 * t) % h, int(1.5 * t) % w), axis=(0, 1))
        f = f.copy()
        y0 = (h // 4 + 3 * t) % (h - sq)
        x0 = (w // 4 + 4 * t) % (w - sq)
        f[y0:y0 + sq, x0:x0 + sq] = rng.random(3).astype(np.float32)
        out.append(np.clip(f, 0.0, 1.0))
    return out


def calibrate_video(params, size=512, frames=3, margin=1.0):
    """Return the int8 calibration table for a video-model param dict.

    Runs in whatever precision mode is CURRENTLY set (use bf16 + packed
    width 2 — the serving config the scales will serve); restores no
    global state itself."""
    import jax
    import jax.numpy as jnp

    from ..models import lssvc as lssvc_model
    from ..ops import int8 as q8
    from ..utils.resize import imresize

    el_hw = (size, size)
    bl_hw = (size // 2, size // 2)
    xs_el = [jnp.asarray(f[None]) for f in synthetic_frames(el_hw,
                                                            frames + 1)]
    down = jax.jit(lambda a: imresize(
        a.transpose(0, 3, 1, 2), sizes=bl_hw).transpose(0, 2, 3, 1))
    xs_bl = [down(x) for x in xs_el]

    @jax.jit
    def stats_step(params, x_bl, x_el, dpb):
        stats = {}
        with q8.recording(stats):
            out = lssvc_model.forward_one_frame(
                params, x_bl, x_el, dpb["ref_frame_bl"],
                dpb["ref_frame_el"], dpb["ref_feature_bl"],
                dpb["ref_feature_el"], el_hw, 2.0, (0, 0, 0, 0))
        return out["dpb"], stats

    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    dpb = {
        "ref_frame_bl": xs_bl[0],
        "ref_frame_el": xs_el[0],
        "ref_feature_bl": jax.random.uniform(ks[0], (1, *bl_hw, 64)),
        "ref_feature_el": jax.random.uniform(ks[1], (1, *el_hw, 48)),
    }
    agg = {}
    for i in range(frames):
        dpb, stats = stats_step(params, xs_bl[i + 1], xs_el[i + 1], dpb)
        for k, v in stats.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    return q8.table_from_stats(agg, margin=margin)
