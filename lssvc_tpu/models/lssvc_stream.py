"""LSSVCExtend real-bitstream paths (enhancement layer).

Behavioral contract: `/root/reference/src/models/LSSVC_net_extend.py:24-263`
— stream order mv_z, mv_y, z, then the four checkerboard latent passes
y_q_w_0..3, all in one buffered rANS stream.

Decoder: jitted stages split at entropy-decode boundaries; the four-part
prior decode alternates (device scale-plane computation) <-> (host rANS
decode), with all other activations resident on device.

**Closed-loop staged encoding** (see dmc_stream.py docstring for the full
rationale): the encoder derives every scale-index and means plane — including
all four spatial-prior passes — by running the DECODER's own jitted stages on
int32-normalized symbol planes; only the pure analysis fronts (EL SpyNet +
mv AE, res AE) are encoder-only programs.  This makes encoder and decoder
bit-identical by construction; a separately-fused encoder program would risk
last-bit scale differences flipping index buckets and desynchronizing the
rANS stream mid-frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..convert import P
from ..entropy.models import build_indexes_video
from ..ops import pad_nhwc
from ..utils.stream import get_downsampled_shape
from .four_part_prior import (
    PASS_MASKS,
    checkerboard_masks,
    spatial_prior_net,
)
from .lssvc import (
    el_recon_generation,
    el_res_decoder,
    el_res_encoder,
    hybrid_context_fusion,
    mv_context_transformer,
    mv_ctx_prior_encoder,
    mv_hyper_decoder,
    mv_prior_fusion,
    mv_res_decoder,
    res_prior_decoder,
    res_prior_encoder,
    temporal_prior_encoder,
)
from .lssvc_blocks import layer_prior_resampler, mv_resampler, prior_fusion


# EL residual hyper-latent channel width (fixed by the architecture;
# `LSSVC_net.py` res_prior_encoder output) — shared with pipeline.py's
# overlapped decode so the factorized-plane shape exists ONCE
EL_Z_CHANNELS = 128


def _depad(dpb, pad_size):
    texture = pad_nhwc(dpb["texture"], pad_size)
    mv_bl_hat = pad_nhwc(dpb["mv_hat_bl"], pad_size)
    y_bl_hat = pad_nhwc(dpb["y_hat_bl"], tuple(int(v / 16) for v in pad_size))
    return texture, mv_bl_hat, y_bl_hat


def _f32(a):
    return a.astype(jnp.float32)


@jax.jit
def _enc_mv_analysis(params, x_el, ref_el, mv_ctx):
    """Encoder-only EL motion analysis front: SpyNet -> ctx-conditioned
    mv AE -> hyper AE.  mv_ctx comes from the decoder's `_dec_mv_setup`."""
    from .lssvc import me_spynet, mv_hyper_encoder, mv_res_encoder

    p = P(params)
    mv = me_spynet(p.sub("optic_flow"), x_el, ref_el)
    mv_y = mv_res_encoder(p.sub("mv_encoder"), mv, mv_ctx)
    mv_z = mv_hyper_encoder(p.sub("mv_prior_encoder"), mv_y)
    ok = jnp.isfinite(mv_y).all() & jnp.isfinite(mv_z).all()
    return mv_y, jnp.round(mv_z).astype(jnp.int32), ok


@jax.jit
def _enc_res_analysis(params, x_el, c1, c2, c3):
    p = P(params)
    y = el_res_encoder(p.sub("res_encoder"), x_el, c1, c2, c3)
    z = res_prior_encoder(p.sub("res_prior_encoder"), y)
    ok = jnp.isfinite(y).all() & jnp.isfinite(z).all()
    return y, jnp.round(z).astype(jnp.int32), ok


@jax.jit
def _quantize_i(y, means):
    return jnp.round(y - means).astype(jnp.int32)


def _enc_pass_symbols(pass_idx, y, means_4_stacked):
    """Symbol plane for one four-part-prior pass: each channel quarter's
    round(y - means) on its pass mask, summed into one (1,h,w,C/4) plane
    (disjoint masks; `LSSVC_net.py:338-443` write path).  means come from
    the decoder's `_dec_pass_update` chain."""
    _, h, w, _ = y.shape
    masks = checkerboard_masks(h, w)
    y_4 = jnp.split(y, 4, axis=-1)
    sym = sum(jnp.round((y_4[q] - means_4_stacked[q]) * masks[m])
              for q, m in enumerate(PASS_MASKS[pass_idx]))
    return sym.astype(jnp.int32)


_enc_pass_symbols_jit = jax.jit(_enc_pass_symbols, static_argnums=(0,))


def encode_device(params, x_el, ref_el, feature_el, texture, mv_bl_hat,
                  y_bl_hat, shape_hr, scale_factor):
    """All device work for one EL frame, closed-loop staged.  Returns
    (planes, dpb); the DPB is bit-identical to the decoder's."""
    mv_ctx, mv_ctx_prior = _dec_mv_setup_jit(params, mv_bl_hat, shape_hr,
                                             scale_factor)
    from ..utils.checks import finite_flags

    mv_y, mv_z_i, mv_ok = _enc_mv_analysis(params, x_el, ref_el, mv_ctx)
    mv_idx, mv_means = _dec_mv_prior(params, _f32(mv_z_i), mv_ctx_prior)
    mv_y_q_i = _quantize_i(mv_y, mv_means)
    mv_hat, c1, c2, c3, warp_frame = _dec_contexts_jit(
        params, _f32(mv_y_q_i), mv_means, mv_ctx, texture, ref_el,
        feature_el, shape_hr)
    y, z_i, y_ok = _enc_res_analysis(params, x_el, c1, c2, c3)
    common = _dec_common_params_jit(params, _f32(z_i), c3, y_bl_hat, shape_hr)
    # device bool scalars, checked host-side in write_planes — a blocking
    # assert here would stall dispatch of the four-part-prior passes
    finite = finite_flags(mv_analysis=mv_ok, mv_means=mv_means,
                          res_analysis=y_ok, common_params=common)

    half = common.shape[-1] // 2
    means_4 = jnp.stack(jnp.split(common[..., half:], 4, axis=-1))
    idx = _dec_pass0_scales(params, common)
    y_syms, y_idxs = [], []
    y_hat = None
    for pass_idx in range(4):
        sym_i = _enc_pass_symbols_jit(pass_idx, y, means_4)
        y_syms.append(sym_i)
        y_idxs.append(idx)
        y_hat, idx, means_4 = _dec_pass_update_jit(
            params, pass_idx, _f32(sym_i), y_hat, common, means_4)
    recon_el, feature = _dec_recon(params, y_hat, c1, c2, c3)

    planes = {
        "finite": finite,
        "mv_z_hat": mv_z_i,
        "mv_y_q": mv_y_q_i,
        "mv_idx": mv_idx,
        "z_hat": z_i,
        "y_syms": y_syms,
        "y_idxs": y_idxs,
    }
    dpb = {
        "ref_frame_el": recon_el,
        "ref_feature_el": feature,
        "warp_frame": warp_frame,
        "mv_hat": mv_hat,
    }
    return planes, dpb


def write_planes(coder, planes):
    """Host half: rANS-encode one EL frame's planes (order per
    LSSVC_net_extend.py:66-74)."""
    from ..utils.checks import raise_if_nonfinite

    if "finite" in planes:
        raise_if_nonfinite("LSSVC EL encode", planes["finite"])
    coder.reset_encoder()
    coder.encode_factorized(np.asarray(planes["mv_z_hat"]), coder.z_mv_table)
    coder.encode_gaussian(np.asarray(planes["mv_y_q"]),
                          np.asarray(planes["mv_idx"]))
    coder.encode_factorized(np.asarray(planes["z_hat"]), coder.z_table)
    for sym, idx in zip(planes["y_syms"], planes["y_idxs"]):
        coder.encode_gaussian(np.asarray(sym), np.asarray(idx))
    return coder.flush()


def compress(model, x_el, dpb):
    from ..utils.checks import sanitize_dpb

    dpb = sanitize_dpb(dpb)
    texture, mv_bl_hat, y_bl_hat = _depad(dpb, model.pad_size)
    planes, out_dpb = encode_device(
        model.params, x_el, dpb["ref_frame_el"], dpb["ref_feature_el"],
        texture, mv_bl_hat, y_bl_hat, model.shape_hr, model.scale_factor)
    string = write_planes(model._coder, planes)
    return {"string": string, "dpb": out_dpb}


# --- decoder stages ---------------------------------------------------------

def _dec_mv_setup(params, mv_bl_hat, shape_hr, scale_factor):
    p = P(params)
    mv_upsample = mv_resampler(p.sub("mv_resampler"), mv_bl_hat, shape_hr,
                               scale_factor)
    mv_ctx_prior = mv_ctx_prior_encoder(p.sub("mv_ctx_prior_encoder"),
                                        mv_upsample)
    mv_ctx = mv_context_transformer(p.sub("mv_ctx_transform"), mv_upsample)
    return mv_ctx, mv_ctx_prior


_dec_mv_setup_jit = jax.jit(_dec_mv_setup, static_argnums=(2, 3))


@jax.jit
def _dec_mv_prior(params, mv_z_hat, mv_ctx_prior):
    p = P(params)
    hyper = mv_hyper_decoder(p.sub("mv_prior_decoder"), mv_z_hat)
    mv_params = mv_prior_fusion(
        p.sub("mv_prior_fusion"),
        jnp.concatenate([hyper, mv_ctx_prior], axis=-1))
    half = mv_params.shape[-1] // 2
    scales, means = mv_params[..., :half], mv_params[..., half:]
    return build_indexes_video(scales), means


def _dec_contexts(params, mv_y_q, mv_means, mv_ctx, texture, ref_el,
                  feature_el, shape_hr):
    p = P(params)
    mv_y_hat = mv_y_q + mv_means
    mv_hat = mv_res_decoder(p.sub("mv_decoder"), mv_y_hat, mv_ctx)
    c1, c2, c3, warp_frame = hybrid_context_fusion(p, texture, mv_hat, ref_el,
                                                   feature_el, shape_hr)
    return mv_hat, c1, c2, c3, warp_frame


_dec_contexts_jit = jax.jit(_dec_contexts, static_argnums=(7,))


def _dec_common_params(params, z_hat, c3, y_bl_hat, shape_hr):
    p = P(params)
    hierarchical = res_prior_decoder(p.sub("res_prior_decoder"), z_hat)
    temporal = temporal_prior_encoder(p.sub("temporal_prior_encoder"), c3)
    layer_prior = layer_prior_resampler(
        p.sub("layer_prior_resampler"), y_bl_hat,
        (shape_hr[0] // 16, shape_hr[1] // 16))
    return prior_fusion(p.sub("prior_fusion_net"), hierarchical, temporal,
                        layer_prior)


_dec_common_params_jit = jax.jit(_dec_common_params, static_argnums=(4,))


@jax.jit
def _dec_pass0_scales(params, common_params):
    half = common_params.shape[-1] // 2
    scales = common_params[..., :half]
    _, h, w, _ = scales.shape
    masks = checkerboard_masks(h, w)
    scales_4 = jnp.split(scales, 4, axis=-1)
    scales_r = sum(scales_4[q] * masks[m] for q, m in enumerate(PASS_MASKS[0]))
    return build_indexes_video(scales_r)


def _dec_pass_update(params, pass_idx, y_q_r, y_hat_so_far, common_params,
                     means_4_stacked):
    """Fold decoded plane into y_hat and compute next pass's scale indexes."""
    p = P(params)
    _, h, w, _ = y_q_r.shape
    masks = checkerboard_masks(h, w)
    mask_ids = PASS_MASKS[pass_idx]
    means_4 = [means_4_stacked[i] for i in range(4)]
    step = jnp.concatenate(
        [(y_q_r + means_4[q]) * masks[m] for q, m in enumerate(mask_ids)],
        axis=-1)
    y_hat_so_far = step if y_hat_so_far is None else y_hat_so_far + step

    if pass_idx == 3:
        return y_hat_so_far, None, None
    nxt = pass_idx + 1
    pr = spatial_prior_net(
        p, p.sub(f"y_spatial_prior_adaptor_{nxt}"),
        jnp.concatenate([y_hat_so_far, common_params], axis=-1))
    parts = jnp.split(pr, 8, axis=-1)
    scales_4, means_4n = parts[:4], parts[4:]
    scales_r = sum(scales_4[q] * masks[m]
                   for q, m in enumerate(PASS_MASKS[nxt]))
    return y_hat_so_far, build_indexes_video(scales_r), jnp.stack(means_4n)


_dec_pass_update_jit = jax.jit(_dec_pass_update, static_argnums=(1,))


@jax.jit
def _dec_recon(params, y_hat, c1, c2, c3):
    p = P(params)
    recon_feature = el_res_decoder(p.sub("res_decoder"), y_hat, c2, c3)
    feature, recon = el_recon_generation(p.sub("recon_generation_net"),
                                         recon_feature, c1)
    return recon, feature


def decompress(model, string, height, width, dpb):
    from ..utils.checks import sanitize_dpb
    from .dmc_stream import _StageTimer

    dpb = sanitize_dpb(dpb)
    coder = model._coder
    params = model.params
    shape_hr = model.shape_hr
    profiling = (model.decoding_profiling
                 if getattr(model, "profile_decoding", False) else None)
    timer = _StageTimer(profiling)
    texture, mv_bl_hat, y_bl_hat = _depad(dpb, model.pad_size)
    timer.begin("mv_setup")
    mv_ctx, mv_ctx_prior = _dec_mv_setup_jit(params, mv_bl_hat, shape_hr,
                                             model.scale_factor)
    timer.mark("entropy_dec_mv_z", mv_ctx_prior)
    coder.set_stream(string)
    zh, zw = get_downsampled_shape(height, width, 64)
    mv_z = coder.decode_factorized((1, zh, zw, model.channel_mv),
                                   coder.z_mv_table)
    timer.mark("mv_prior_dec")
    mv_idx, mv_means = _dec_mv_prior(params, jnp.asarray(mv_z), mv_ctx_prior)
    timer.mark("entropy_dec_mv_y", mv_idx)
    mv_y_q = coder.decode_gaussian(np.asarray(mv_idx))
    timer.mark("mv_dec_ctx")
    mv_hat, c1, c2, c3, _ = _dec_contexts_jit(
        params, jnp.asarray(mv_y_q), mv_means, mv_ctx, texture,
        dpb["ref_frame_el"], dpb["ref_feature_el"], shape_hr)
    timer.mark("entropy_dec_z", c1, c2, c3)
    z = coder.decode_factorized((1, zh, zw, EL_Z_CHANNELS), coder.z_table)
    timer.mark("y_prior")
    common_params = _dec_common_params_jit(params, jnp.asarray(z), c3,
                                           y_bl_hat, shape_hr)

    # pass 0 uses common_params' own scales/means
    half = common_params.shape[-1] // 2
    means_4 = jnp.stack(jnp.split(common_params[..., half:], 4, axis=-1))
    idx = _dec_pass0_scales(params, common_params)
    y_hat = None
    # the alternating rANS-decode / spatial-prior-update passes each
    # accumulate into one key (4 contributions per frame)
    for pass_idx in range(4):
        timer.mark("entropy_dec_y", idx)
        y_q_r = jnp.asarray(coder.decode_gaussian(np.asarray(idx)))
        timer.mark("spatial_prior_update")
        y_hat, idx, means_4 = _dec_pass_update_jit(
            params, pass_idx, y_q_r, y_hat, common_params, means_4)
    timer.mark("res_dec", y_hat)
    recon, feature = _dec_recon(params, y_hat, c1, c2, c3)
    timer.finish(recon)
    return {
        "dpb": {
            "ref_frame_el": recon,
            "ref_feature_el": feature,
        },
        "context": c1,
    }
