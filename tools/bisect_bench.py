#!/usr/bin/env python
"""Bisect the 1080p two-layer forward: stub out one subsystem at a time and
measure the chained per-frame time.  Identifies which subsystem owns the
wall-clock without per-op profiling (unavailable through the remote tunnel).

Usage: python tools/bisect_bench.py [variant ...]
Variants: full no_gathers no_spynet no_unet no_resize no_offset_diversity
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

EL_HW = (1152, 1920)
K = 3
MODE = os.environ.get("LSSVC_BENCH_MODE", "bf16")


def patch(variant):
    import lssvc_tpu.models.components as comp
    import lssvc_tpu.models.dmc as dmc
    import lssvc_tpu.models.lssvc as lssvc
    import lssvc_tpu.models.lssvc_blocks as blocks
    import lssvc_tpu.ops as ops

    if variant == "no_gathers":
        ident = lambda x, flow, **kw: x

        comp.flow_warp = ident
        dmc.flow_warp = ident
        lssvc.flow_warp = ident
        blocks.grouped_warp_auto = (
            lambda x, fx, fy, m, g, **kw: jnp.concatenate([x, x], axis=-1))
    elif variant == "no_spynet":
        def zero_flow(p, a, b, levels=4):
            return jnp.zeros((a.shape[0], a.shape[1], a.shape[2], 2),
                             dtype=a.dtype)

        dmc.me_spynet = zero_flow
        lssvc.me_spynet = zero_flow
    elif variant == "no_unet":
        comp.unet = lambda p, x: x
        blocks.unet = lambda p, x: x
    elif variant == "no_resize":
        def cheap_resize(x, out_hw):
            if (x.shape[1], x.shape[2]) == tuple(out_hw):
                return x
            reps_h = out_hw[0] // x.shape[1] if out_hw[0] >= x.shape[1] else 1
            y = x[:, :out_hw[0], :out_hw[1], :]
            if y.shape[1] != out_hw[0] or y.shape[2] != out_hw[1]:
                y = jnp.zeros((x.shape[0], out_hw[0], out_hw[1], x.shape[3]),
                              dtype=x.dtype)
            return y

        for m in (comp, blocks):
            m.bilinear_resize = cheap_resize
        comp.bilinear_upsample2 = lambda x: cheap_resize(
            x, (x.shape[1] * 2, x.shape[2] * 2))
        comp.bilinear_downsample2 = lambda x: x[:, ::2, ::2, :]
        blocks.bilinear_upsample2 = comp.bilinear_upsample2
    elif variant == "no_bits":
        zero_bits = lambda *a: (jnp.zeros(()), None)
        dmc.factorized_bits = zero_bits
        dmc.laplace_bits = zero_bits
        lssvc.factorized_bits = zero_bits
        lssvc.laplace_bits = zero_bits
    elif variant == "no_gdn":
        ident_gdn = lambda p, x, inverse=False: x
        comp.gdn_p = ident_gdn
        dmc.gdn_p = ident_gdn
        import lssvc_tpu.models.lssvc_blocks as _b
        _b.gdn_p = ident_gdn
    elif variant == "od_warp_stub":
        # keep OD preamble convs + fusion, stub ONLY the grouped warp
        blocks.grouped_warp_auto = (
            lambda x, fx, fy, m, g, **kw: jnp.concatenate([x, x], axis=-1))
    elif variant == "no_single_warps":
        ident = lambda x, flow, **kw: x
        comp.flow_warp = ident
        dmc.flow_warp = ident
        lssvc.flow_warp = ident
    elif variant == "no_offset_diversity":
        def od_stub(p, x, aux, flow, **kw):
            return x

        lssvc.offset_diversity = od_stub
    elif variant == "no_four_part":
        # single-pass latent coding in place of the 4-pass spatial prior
        def single_pass(p, y, common_params, write=False):
            half = common_params.shape[-1] // 2
            scales = common_params[..., :half]
            means = common_params[..., half:]
            y_q = ops.ste_round(y - means)
            y_hat = y_q + means
            if write:
                return [y_q] * 4, [scales] * 4, y_hat
            return y - means, y_q, y_hat, scales

        import lssvc_tpu.models.four_part_prior as fpp
        lssvc.forward_four_part_prior = single_pass
        fpp.forward_four_part_prior = single_pass
    elif variant == "no_contexts":
        # stub BOTH layers' temporal/hybrid context stacks (keeps AEs,
        # priors, recon): measures motion-comp + fusion + OD end to end
        def bl_ctx(p, ref, feature, mv):
            b, h, w, _ = ref.shape
            z = jnp.zeros((b, h, w, 64), ref.dtype)
            return (z, jnp.zeros((b, h // 2, w // 2, 64), ref.dtype),
                    jnp.zeros((b, h // 4, w // 4, 64), ref.dtype), ref)

        def el_ctx(p, texture, mv, ref_el, feature_el, shape_hr):
            b, h, w, _ = ref_el.shape
            return (jnp.zeros((b, h, w, 48), ref_el.dtype),
                    jnp.zeros((b, h // 2, w // 2, 64), ref_el.dtype),
                    jnp.zeros((b, h // 4, w // 4, 96), ref_el.dtype),
                    ref_el)

        dmc.motion_compensation = bl_ctx
        lssvc.hybrid_context_fusion = el_ctx
    elif variant == "no_recon_gen":
        def fit_ch(t, c):
            if t.shape[-1] >= c:
                return t[..., :c]
            return jnp.pad(t, ((0, 0),) * 3 + ((0, c - t.shape[-1]),))

        def recon_simple(p, feat, c1):
            return fit_ch(feat, 64), feat[..., :3]

        def recon_el(p, feat, c1):
            return fit_ch(feat, 48), feat[..., :3]

        dmc.recon_generation_simple = recon_simple
        lssvc.el_recon_generation = recon_el
        comp.recon_generation_simple = recon_simple
    elif variant == "no_res_ae":
        def enc_stub(p, x, c1, c2, c3):
            b, h, w, _ = x.shape
            return jnp.zeros((b, h // 16, w // 16, 128), x.dtype)

        def dec_stub(p, y_hat, c2, c3):
            b, h, w, _ = y_hat.shape
            return jnp.zeros((b, h * 16, w * 16, 32), y_hat.dtype)

        lssvc.el_res_encoder = enc_stub
        lssvc.el_res_decoder = dec_stub
    elif variant != "full":
        raise ValueError(variant)


def run(variant):
    from lssvc_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from lssvc_tpu.ops import set_precision_mode
    if MODE == "bf16_packed":
        from lssvc_tpu.ops.nn import set_packed_width

        set_precision_mode("bf16")
        set_packed_width(2)
    else:
        set_precision_mode(MODE)
    patch(variant)
    from lssvc_tpu.models import lssvc as lssvc_model
    from lssvc_tpu.models.init import init_lssvc

    params = init_lssvc(0)
    bl_hw = (EL_HW[0] // 2, EL_HW[1] // 2)

    @jax.jit
    def step(params, x_bl, x_el, dpb, bits_acc):
        out = lssvc_model.forward_one_frame(
            params, x_bl, x_el, dpb["ref_frame_bl"], dpb["ref_frame_el"],
            dpb["ref_feature_bl"], dpb["ref_feature_el"],
            EL_HW, 2.0, (0, 0, 0, 0))
        return out["dpb"], bits_acc + out["bit_bl"] + out["bit_el"]

    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x_bl = jax.random.uniform(ks[0], (1, *bl_hw, 3))
    x_el = jax.random.uniform(ks[1], (1, *EL_HW, 3))
    dpb0 = {
        "ref_frame_bl": jax.random.uniform(ks[2], (1, *bl_hw, 3)),
        "ref_frame_el": jax.random.uniform(ks[3], (1, *EL_HW, 3)),
        "ref_feature_bl": jax.random.uniform(ks[4], (1, *bl_hw, 64)),
        "ref_feature_el": jax.random.uniform(ks[5], (1, *EL_HW, 48)),
    }

    def chain(n):
        dpb = dpb0
        bits = jnp.zeros(())
        for _ in range(n):
            dpb, bits = step(params, x_bl, x_el, dpb, bits)
        return float(np.asarray(bits))

    from tools.measure import stable_measure

    best = stable_measure(chain, K)
    print(f"{variant:22s} {best * 1000:10.0f} ms/frame", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "full")
