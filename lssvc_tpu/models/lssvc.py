"""LSSVC — the enhancement-layer P-frame codec (the paper's core model).

Behavioral contract: `/root/reference/src/models/LSSVC_net.py:12-528` and the
streaming extension `LSSVC_net_extend.py`.  Per two-layer P-frame:

  BL: DMC conditional coding (base_layer_model.*)
  inter-layer: MvResampler / TextureResampler / LayerPriorResampler lift the
    BL motion, texture and latent onto the EL grids
  EL motion: SpyNet flow coded conditionally on the upsampled BL motion
  EL context: motion-compensated temporal contexts (with OffsetDiversity
    alignment) blended with resampled BL texture via learned softmax maps
  EL residual: conditional AE whose entropy parameters fuse hyper, temporal
    and layer priors, quantized through the four-part checkerboard prior

The full two-layer forward is a single jitted NHWC program; `shape_hr`,
`scale_factor` and `pad_size` are static arguments (one executable per
resolution/ratio).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp

# chip A/B flag: route the EL pair warp + OffsetDiversity aux through the
# fused packed-store path (no full-res pack relayout of the 53ch aux).
# Off by default until the on-chip A/B lands a number
# (docs/PERFORMANCE.md; exactness pinned by
# tests/test_lssvc.py::test_packed_ctx_path_matches_default).
_PACKED_CTX = os.environ.get("LSSVC_PACKED_CTX", "0") == "1"

from ..convert import P
from ..entropy.models import factorized_bits, laplace_bits
from ..ops import leaky_relu, pad_nhwc, ste_round
from ..ops.warp_pallas import flow_warp_auto as flow_warp
from ..ops.warp_pallas import flow_warp_pair
from .base import Model
from . import dmc
from .components import (
    conv,
    feature_extractor_3scale,
    gdn_p,
    me_spynet,
    multi_scale_context_fusion,
    res_block,
    scaled_flows,
    subpel_conv,
)
from .four_part_prior import forward_four_part_prior
from .lssvc_blocks import (
    el_recon_generation,
    el_res_decoder,
    el_res_encoder,
    hybrid_weight_generator,
    layer_prior_resampler,
    mv_context_transformer,
    mv_res_decoder,
    mv_res_encoder,
    mv_resampler,
    offset_diversity,
    prior_fusion,
    texture_resampler,
)

LOG2 = math.log(2.0)


def mv_ctx_prior_encoder(p, mv_upsample):
    """4x stride-2 conv+GDN on the upsampled BL motion (`LSSVC_net.py:108-116`)."""
    f = conv(p.sub("0"), mv_upsample, stride=2)
    f = gdn_p(p.sub("1"), f)
    f = conv(p.sub("2"), f, stride=2)
    f = gdn_p(p.sub("3"), f)
    f = conv(p.sub("4"), f, stride=2)
    f = gdn_p(p.sub("5"), f)
    return conv(p.sub("6"), f, stride=2)


def mv_hyper_encoder(p, x):
    f = leaky_relu(conv(p.sub("0"), x), 0.01)
    f = leaky_relu(conv(p.sub("2"), f, stride=2), 0.01)
    return conv(p.sub("4"), f, stride=2)


def mv_hyper_decoder(p, z_hat):
    f = leaky_relu(subpel_conv(p.sub("0"), z_hat, 2), 0.01)
    f = leaky_relu(subpel_conv(p.sub("2"), f, 2), 0.01)
    return conv(p.sub("4"), f)


def mv_prior_fusion(p, x):
    f = leaky_relu(conv(p.sub("0"), x), 0.01)
    f = leaky_relu(conv(p.sub("2"), f), 0.01)
    return conv(p.sub("4"), f)


def res_prior_encoder(p, y):
    f = leaky_relu(conv(p.sub("0"), y), 0.01)
    f = leaky_relu(conv(p.sub("2"), f, stride=2), 0.01)
    return conv(p.sub("4"), f, stride=2)


def res_prior_decoder(p, z_hat):
    f = leaky_relu(conv(p.sub("0"), z_hat), 0.01)
    f = leaky_relu(subpel_conv(p.sub("2"), f, 2), 0.01)
    f = leaky_relu(conv(p.sub("4"), f), 0.01)
    f = leaky_relu(subpel_conv(p.sub("6"), f, 2), 0.01)
    return conv(p.sub("8"), f)


def temporal_prior_encoder(p, c3):
    f = conv(p.sub("0"), c3, stride=2)
    f = leaky_relu(f, 0.1)
    return conv(p.sub("2"), f, stride=2)


def el_feature_adaptor(p, ref_el, feature_el):
    """Static dispatch on DPB feature provenance (`LSSVC_net.py:195-202`).

    The steady-state (48ch full-res) adaptor routes through the
    width-packed domain in serving mode — it was the last unpacked
    full-res conv of the EL context path."""
    from ..ops.nn import packed_width

    if feature_el is None:
        return conv(p.sub("feature_adaptor_EL_I"), ref_el)
    if feature_el.shape[-1] == 64:
        return conv(p.sub("feature_adaptor_EL_first_P"), feature_el)
    if packed_width() == 2:
        from .packed_blocks import packed_region, pconv

        return packed_region(
            feature_el, lambda xp: pconv(p.sub("feature_adaptor_EL"), xp))
    return conv(p.sub("feature_adaptor_EL"), feature_el)


def el_motion_compensation(p, ref_el, feature_el, mv):
    """Warp EL features at 3 scales with OffsetDiversity refinement at full
    resolution (`LSSVC_net.py:229-244`)."""
    from ..ops.warp import clamp_flow

    mv = clamp_flow(mv, ref_el.shape[1], ref_el.shape[2])  # exact; see clamp_flow
    mv1, mv2, mv3 = scaled_flows(mv)
    f = el_feature_adaptor(p, ref_el, feature_el)
    f1, f2, f3 = feature_extractor_3scale(p.sub("feature_extractor"), f)
    # one max-reduction serves every warp of this motion field; ref_el &
    # f1 share mv, so they warp in one kernel dispatch (exact: warping is
    # per-channel).  mv1 is mv itself (scaled_flows).  The reference
    # frame joins f1's compute dtype so a bf16 f1 keeps the pair on the
    # warp kernels' half-traffic bf16 boundary path (f32 in parity mode).
    from ..ops.nn import compute_dtype, packed_width

    fx_max = jnp.max(jnp.abs(mv[..., 0]))
    fy_max = jnp.max(jnp.abs(mv[..., 1]))
    if (_PACKED_CTX and packed_width() == 2
            and ref_el.shape[2] % 4 == 0):
        # fused packed pair warp: the kernel stores [ref_el, f1] warped
        # straight into the width-packed domain and the OffsetDiversity
        # entry conv consumes it via a kernel-channel permutation — the
        # 53ch full-res pack_width relayout of the aux tensor disappears
        # (chip A/B flag LSSVC_PACKED_CTX; exact, see
        # tests/test_lssvc.py::test_packed_ctx_path_matches_default)
        from ..ops.packed import pack_width, unpack_width

        pair_p = flow_warp(
            jnp.concatenate([ref_el.astype(compute_dtype()), f1], axis=-1),
            mv, fmax=(fx_max, fy_max), packed_out=True)
        c_pair = pair_p.shape[-1] // 2
        warpframe = unpack_width(
            jnp.concatenate([pair_p[..., :3],
                             pair_p[..., c_pair:c_pair + 3]], axis=-1), 2)
        c1 = offset_diversity(p.sub("align"), f1, None, mv,
                              aux_pair_packed=pair_p,
                              mv_packed=pack_width(mv, 2))
    else:
        warpframe, c1_init = flow_warp_pair(ref_el.astype(compute_dtype()),
                                            f1, mv, fmax=(fx_max, fy_max))
        c1 = offset_diversity(
            p.sub("align"), f1,
            jnp.concatenate([c1_init, warpframe, mv], axis=-1), mv)
    c2 = flow_warp(f2, mv2, fmax=(0.5 * fx_max, 0.5 * fy_max))
    c3 = flow_warp(f3, mv3, fmax=(0.25 * fx_max, 0.25 * fy_max))
    c1, c2, c3 = multi_scale_context_fusion(p.sub("context_fusion_net"), c1, c2, c3)
    return (c1, c2, c3), warpframe


def hybrid_context_fusion(p, texture_bl, mv, ref_el, feature_el, shape_hr):
    """Blend temporal and spatial (BL-texture) contexts (`LSSVC_net.py:246-259`)."""
    temporal_ctx, warp_frame = el_motion_compensation(p, ref_el, feature_el, mv)
    if texture_bl is not None:
        texture = texture_resampler(p.sub("texture_resampler"), texture_bl, shape_hr)
        spatial_ctx = feature_extractor_3scale(p.sub("texture_extractor"), texture)
        map_t, map_s = hybrid_weight_generator(p.sub("weight_map_generator"),
                                               temporal_ctx, spatial_ctx)
        c1 = temporal_ctx[0] * map_t[0] + spatial_ctx[0] * map_s[0]
        c2 = temporal_ctx[1] * map_t[1] + spatial_ctx[1] * map_s[1]
        c3 = temporal_ctx[2] * map_t[2] + spatial_ctx[2] * map_s[2]
    else:
        c1, c2, c3 = temporal_ctx
    c1, c2, c3 = multi_scale_context_fusion(p.sub("context_fusion_net"), c1, c2, c3)
    return c1, c2, c3, warp_frame


def el_motion_coding(p, x_el, ref_el, mv_bl_hat, shape_hr, scale_factor):
    """BL-conditioned EL motion estimation + coding.  Returns everything the
    residual stage and the bit count need."""
    mv_upsample = mv_resampler(p.sub("mv_resampler"), mv_bl_hat, shape_hr,
                               scale_factor)
    mv_ctx_prior = mv_ctx_prior_encoder(p.sub("mv_ctx_prior_encoder"), mv_upsample)
    mv_ctx = mv_context_transformer(p.sub("mv_ctx_transform"), mv_upsample)

    mv = me_spynet(p.sub("optic_flow"), x_el, ref_el)
    mv_y = mv_res_encoder(p.sub("mv_encoder"), mv, mv_ctx)
    mv_z = mv_hyper_encoder(p.sub("mv_prior_encoder"), mv_y)
    mv_z_hat = ste_round(mv_z)
    mv_hyper_prior = mv_hyper_decoder(p.sub("mv_prior_decoder"), mv_z_hat)
    mv_params = mv_prior_fusion(
        p.sub("mv_prior_fusion"),
        jnp.concatenate([mv_hyper_prior, mv_ctx_prior], axis=-1))
    half = mv_params.shape[-1] // 2
    mv_scales_hat = mv_params[..., :half]
    mv_means_hat = mv_params[..., half:]
    mv_y_q = ste_round(mv_y - mv_means_hat)
    mv_y_hat = mv_y_q + mv_means_hat
    mv_hat = mv_res_decoder(p.sub("mv_decoder"), mv_y_hat, mv_ctx)
    return {
        "mv_hat": mv_hat,
        "mv_y_q": mv_y_q,
        "mv_z_hat": mv_z_hat,
        "mv_scales_hat": mv_scales_hat,
        "mv_ctx": mv_ctx,
        "mv_ctx_prior": mv_ctx_prior,
    }


def el_forward(params, x_el, ref_el, feature_el, texture_bl, mv_bl_hat,
               y_bl_hat, shape_hr, scale_factor):
    """Full EL P-frame forward (estimated bits)."""
    p = P(params)
    mc = el_motion_coding(p, x_el, ref_el, mv_bl_hat, shape_hr, scale_factor)
    c1, c2, c3, warp_frame = hybrid_context_fusion(
        p, texture_bl, mc["mv_hat"], ref_el, feature_el, shape_hr)

    y = el_res_encoder(p.sub("res_encoder"), x_el, c1, c2, c3)
    z = res_prior_encoder(p.sub("res_prior_encoder"), y)
    z_hat = ste_round(z)
    hierarchical = res_prior_decoder(p.sub("res_prior_decoder"), z_hat)
    temporal = temporal_prior_encoder(p.sub("temporal_prior_encoder"), c3)
    layer_prior = layer_prior_resampler(
        p.sub("layer_prior_resampler"), y_bl_hat,
        (shape_hr[0] // 16, shape_hr[1] // 16))
    common_params = prior_fusion(p.sub("prior_fusion_net"), hierarchical,
                                 temporal, layer_prior)

    y_res, y_q, y_hat, scales_hat = forward_four_part_prior(p, y, common_params)

    recon_feature = el_res_decoder(p.sub("res_decoder"), y_hat, c2, c3)
    feature, recon_el = el_recon_generation(p.sub("recon_generation_net"),
                                            recon_feature, c1)

    bits_y, _ = laplace_bits(y_q, scales_hat)
    bits_mv_y, _ = laplace_bits(mc["mv_y_q"], mc["mv_scales_hat"])
    bits_z, _ = factorized_bits(p.sub("bit_estimator_z"), z_hat)
    bits_mv_z, _ = factorized_bits(p.sub("bit_estimator_z_mv"), mc["mv_z_hat"])
    bits_el = bits_y + bits_mv_y + bits_z + bits_mv_z

    return {
        "recon_el": recon_el,
        "feature_el": feature,
        "bits_el": bits_el,
        "mv_hat": mc["mv_hat"],
        "warp_frame": warp_frame,
        "context": c1,
    }


def forward_one_frame(params, x_bl, x_el, ref_frame_bl, ref_frame_el,
                      ref_feature_bl, ref_feature_el, shape_hr, scale_factor,
                      pad_size):
    """Two-layer P-frame forward (`LSSVC_net.py:445-528`)."""
    bl_params = {k[len("base_layer_model."):]: v for k, v in params.items()
                 if k.startswith("base_layer_model.")}
    bl = dmc.forward_inter(bl_params, x_bl, ref_frame_bl, ref_feature_bl)

    texture = pad_nhwc(bl["feature"], pad_size)
    mv_bl_hat = pad_nhwc(bl["mv_hat"], pad_size)
    y_bl_hat = pad_nhwc(bl["y_hat"], tuple(int(v / 16) for v in pad_size))

    el = el_forward(params, x_el, ref_frame_el, ref_feature_el, texture,
                    mv_bl_hat, y_bl_hat, shape_hr, scale_factor)

    return {
        "dpb": {
            "ref_frame_bl": bl["recon_image"],
            "ref_feature_bl": bl["feature"],
            "ref_frame_el": el["recon_el"],
            "ref_feature_el": el["feature_el"],
        },
        "bit_bl": bl["bits"],
        "bit_el": el["bits_el"],
        "mv_hat": el["mv_hat"],
        "warp_frame": el["warp_frame"],
        "warp_frame_bl": bl["warp_frame"],
        "context": el["context"],
    }


# None DPB entries are empty pytrees — jit re-specializes per structure, so
# one jitted function covers I-ref / first-P / steady-state variants.
_fwd_jit = partial(jax.jit, static_argnums=(7, 8, 9))(forward_one_frame)

_el_fwd_jit = partial(jax.jit, static_argnums=(7, 8))(el_forward)


# --- fine-grained EL stages (batch-of-sequences HBM fit) --------------------

def _el_stage_ctx(params, x_el, ref_el, feature_el, texture_bl, mv_bl_hat,
                  shape_hr, scale_factor):
    """EL motion coding + hybrid context fusion (the HBM-peak stage: warps,
    OffsetDiversity, feature pyramids all live here)."""
    p = P(params)
    mc = el_motion_coding(p, x_el, ref_el, mv_bl_hat, shape_hr, scale_factor)
    c1, c2, c3, warp_frame = hybrid_context_fusion(
        p, texture_bl, mc["mv_hat"], ref_el, feature_el, shape_hr)
    bits_mv_y, _ = laplace_bits(mc["mv_y_q"], mc["mv_scales_hat"])
    bits_mv_z, _ = factorized_bits(p.sub("bit_estimator_z_mv"), mc["mv_z_hat"])
    return (c1, c2, c3, warp_frame, mc["mv_hat"], bits_mv_y + bits_mv_z)


def _el_stage_res(params, x_el, c1, c2, c3, y_bl_hat, shape_hr):
    """Residual AE + priors + four-part prior -> y_hat and residual bits."""
    p = P(params)
    y = el_res_encoder(p.sub("res_encoder"), x_el, c1, c2, c3)
    z = res_prior_encoder(p.sub("res_prior_encoder"), y)
    z_hat = ste_round(z)
    hierarchical = res_prior_decoder(p.sub("res_prior_decoder"), z_hat)
    temporal = temporal_prior_encoder(p.sub("temporal_prior_encoder"), c3)
    layer_prior = layer_prior_resampler(
        p.sub("layer_prior_resampler"), y_bl_hat,
        (shape_hr[0] // 16, shape_hr[1] // 16))
    common_params = prior_fusion(p.sub("prior_fusion_net"), hierarchical,
                                 temporal, layer_prior)
    y_res, y_q, y_hat, scales_hat = forward_four_part_prior(p, y, common_params)
    bits_y, _ = laplace_bits(y_q, scales_hat)
    bits_z, _ = factorized_bits(p.sub("bit_estimator_z"), z_hat)
    return y_hat, bits_y + bits_z


def _el_stage_recon(params, y_hat, c1, c2, c3):
    p = P(params)
    recon_feature = el_res_decoder(p.sub("res_decoder"), y_hat, c2, c3)
    feature, recon_el = el_recon_generation(p.sub("recon_generation_net"),
                                            recon_feature, c1)
    return recon_el, feature


_el_stage_ctx_jit = partial(jax.jit, static_argnums=(6, 7))(_el_stage_ctx)
_el_stage_res_jit = partial(jax.jit, static_argnums=(6,))(_el_stage_res)
_el_stage_recon_jit = jax.jit(_el_stage_recon)


def forward_one_frame_staged3(params, x_bl, x_el, ref_frame_bl, ref_frame_el,
                              ref_feature_bl, ref_feature_el, shape_hr,
                              scale_factor, pad_size):
    """Four-program two-layer P-frame: BL | EL-contexts | EL-res | EL-recon.

    Peak HBM is max(stage peaks) instead of the fused program's global
    peak — the fused 1080p frame needs ~12.8G and the two-program split
    still ~24.5G at batch 2 because the EL stage owns nearly all of it;
    splitting the EL at the context/res/recon boundaries admits
    batch-of-sequences at 1080p on a 15.75G v5e chip.  Costs three extra
    dispatches per frame."""
    bl_params = {k[len("base_layer_model."):]: v for k, v in params.items()
                 if k.startswith("base_layer_model.")}
    bl = dmc._forward_inter_jit(bl_params, x_bl, ref_frame_bl, ref_feature_bl)

    texture = pad_nhwc(bl["feature"], pad_size)
    mv_bl_hat = pad_nhwc(bl["mv_hat"], pad_size)
    y_bl_hat = pad_nhwc(bl["y_hat"], tuple(int(v / 16) for v in pad_size))

    c1, c2, c3, warp_frame, mv_hat, bits_mv = _el_stage_ctx_jit(
        params, x_el, ref_frame_el, ref_feature_el, texture, mv_bl_hat,
        shape_hr, scale_factor)
    y_hat, bits_res = _el_stage_res_jit(params, x_el, c1, c2, c3, y_bl_hat,
                                        shape_hr)
    recon_el, feature = _el_stage_recon_jit(params, y_hat, c1, c2, c3)

    return {
        "dpb": {
            "ref_frame_bl": bl["recon_image"],
            "ref_feature_bl": bl["feature"],
            "ref_frame_el": recon_el,
            "ref_feature_el": feature,
        },
        "bit_bl": bl["bits"],
        "bit_el": bits_mv + bits_res,
        "mv_hat": mv_hat,
        "warp_frame": warp_frame,
        "context": c1,
    }


def forward_one_frame_staged(params, x_bl, x_el, ref_frame_bl, ref_frame_el,
                             ref_feature_bl, ref_feature_el, shape_hr,
                             scale_factor, pad_size):
    """Two-program variant of `forward_one_frame`: BL and EL run as separate
    XLA executables.  Peak HBM is max(stage peaks) + the small inter-layer
    tensors instead of the fused program's global peak — the fused 1080p
    frame needs ~12.8G and OOMs at batch 2 (25.5G > 15.75G on v5e), while
    staging admits larger batch-of-sequences.  Wall-clock cost is one extra
    dispatch."""
    bl_params = {k[len("base_layer_model."):]: v for k, v in params.items()
                 if k.startswith("base_layer_model.")}
    bl = dmc._forward_inter_jit(bl_params, x_bl, ref_frame_bl, ref_feature_bl)

    texture = pad_nhwc(bl["feature"], pad_size)
    mv_bl_hat = pad_nhwc(bl["mv_hat"], pad_size)
    y_bl_hat = pad_nhwc(bl["y_hat"], tuple(int(v / 16) for v in pad_size))

    el = _el_fwd_jit(params, x_el, ref_frame_el, ref_feature_el, texture,
                     mv_bl_hat, y_bl_hat, shape_hr, scale_factor)

    return {
        "dpb": {
            "ref_frame_bl": bl["recon_image"],
            "ref_feature_bl": bl["feature"],
            "ref_frame_el": el["recon_el"],
            "ref_feature_el": el["feature_el"],
        },
        "bit_bl": bl["bits"],
        "bit_el": el["bits_el"],
        "mv_hat": el["mv_hat"],
        "warp_frame": el["warp_frame"],
        "context": el["context"],
    }


_TRANSPOSED = frozenset(
    "base_layer_model." + k for k in dmc.DMC.TRANSPOSED_CONV_KEYS
)


class LSSVC(Model):
    TRANSPOSED_CONV_KEYS = _TRANSPOSED

    def __init__(self, params: dict):
        super().__init__(params)
        self.channel_N = 64
        self.channel_mv = 64
        self.shape_hr = (256, 256)
        self.scale_factor = 2.0
        self.pad_size = (0, 0, 0, 0)
        self._coder = None
        self._bl = None

    @property
    def base_layer_model(self) -> dmc.DMCExtend:
        if self._bl is None:
            bl_params = {k[len("base_layer_model."):]: v
                         for k, v in self.params.items()
                         if k.startswith("base_layer_model.")}
            self._bl = dmc.DMCExtend(bl_params)
        return self._bl

    def set_scale_information(self, scale, shape_hr, pad_size):
        self.scale_factor = float(scale)
        self.shape_hr = tuple(int(v) for v in shape_hr)
        self.pad_size = tuple(int(v) for v in pad_size)

    def forward_one_frame(self, x_bl, x_el, ref_frame_bl, ref_frame_el,
                          ref_feature_bl, ref_feature_el):
        return _fwd_jit(self.params, x_bl, x_el, ref_frame_bl, ref_frame_el,
                        ref_feature_bl, ref_feature_el, self.shape_hr,
                        self.scale_factor, self.pad_size)

    def encode_decode(self, x_bl, x_el, dpb, output_path_bl=None,
                      output_path_el=None, pic_width=None, pic_height=None,
                      pic_width_bl=None, pic_height_bl=None):
        if output_path_el is not None:
            if not hasattr(self, "encode_decode_extend"):
                raise TypeError(
                    "real-bitstream encode_decode requires LSSVCExtend "
                    "(this is the estimated-bpp base class)")
            return self.encode_decode_extend(
                x_bl, x_el, dpb, output_path_bl, output_path_el,
                pic_width, pic_height, pic_width_bl, pic_height_bl)
        out = self.forward_one_frame(
            x_bl, x_el, dpb["ref_frame_bl"], dpb["ref_frame_el"],
            dpb["ref_feature_bl"], dpb["ref_feature_el"])
        return {
            "dpb": out["dpb"],
            "bit_bl": float(out["bit_bl"]),
            "bit_el": float(out["bit_el"]),
            "encoding_time_EL": 0.0,
            "decoding_time_EL": 0.0,
            "encoding_time_BL": 0.0,
            "decoding_time_BL": 0.0,
            "mv_hat": out["mv_hat"],
            "warp_frame": out["warp_frame"],
            "context": out["context"],
        }


class LSSVCExtend(dmc.DecodeProfilingMixin, LSSVC):
    """Real-bitstream two-layer codec (`LSSVC_net_extend.py`)."""

    # EL stream decode stages (lssvc_stream.decompress), mirroring the BL's
    # reference-style per-stage dict (`dmc_net_extend.py:19-47`) on the
    # EL's own pipeline: mv setup/priors, context mining (incl. the
    # OffsetDiversity alignment), the four-part-prior pass loop split into
    # its rANS decodes ("entropy_dec_y", summed over the 4 passes) and its
    # spatial-prior parameter updates ("spatial_prior_update"), and final
    # residual decode + recon generation ("res_dec").
    DECODING_STAGES = (
        "mv_setup", "entropy_dec_mv_z", "mv_prior_dec", "entropy_dec_mv_y",
        "mv_dec_ctx", "entropy_dec_z", "y_prior", "entropy_dec_y",
        "spatial_prior_update", "res_dec")

    def __init__(self, params: dict):
        super().__init__(params)
        self._init_decoding_profiling()

    def update(self, force=False):
        from ..entropy.coder import VideoCoder

        if self._coder is None or force:
            self._coder = VideoCoder(self.params)
            self.base_layer_model.update(force=force)

    def compress(self, x_el, dpb):
        from .lssvc_stream import compress as _compress

        return _compress(self, x_el, dpb)

    def decompress(self, string, height, width, dpb):
        from .lssvc_stream import decompress as _decompress

        return _decompress(self, string, height, width, dpb)

    def encode_decode_extend(self, x_bl, x_el, dpb, output_path_bl=None,
                             output_path_el=None, pic_width=None,
                             pic_height=None, pic_width_bl=None,
                             pic_height_bl=None):
        import time

        from ..utils.stream import decode_p, encode_p, filesize

        bl_result = self.base_layer_model.encode_decode_extend(
            x_bl, dpb, output_path_bl, pic_width_bl, pic_height_bl)
        layer_dpb = bl_result["dpb"]
        dpb = dict(dpb)
        dpb["texture"] = layer_dpb["ref_feature_bl"]
        dpb["y_hat_bl"] = layer_dpb["y_hat_bl"]
        dpb["mv_hat_bl"] = layer_dpb["mv_hat_bl"]

        t0 = time.time()
        encoded = self.compress(x_el, dpb)
        encode_p(encoded["string"], output_path_el)
        bits = filesize(output_path_el) * 8
        jax.block_until_ready(encoded["dpb"]["ref_frame_el"])
        t1 = time.time()
        string = decode_p(output_path_el)
        decoded = self.decompress(string, pic_height, pic_width, dpb)
        jax.block_until_ready(decoded["dpb"]["ref_frame_el"])
        t2 = time.time()

        return {
            "dpb": {
                "ref_frame_bl": layer_dpb["ref_frame_bl"],
                "ref_feature_bl": layer_dpb["ref_feature_bl"],
                "ref_frame_el": decoded["dpb"]["ref_frame_el"],
                "ref_feature_el": decoded["dpb"]["ref_feature_el"],
            },
            "bit_bl": bl_result["bit"],
            "bit_el": bits,
            "encoding_time_EL": t1 - t0,
            "decoding_time_EL": t2 - t1,
            "encoding_time_BL": bl_result["encoding_time"],
            "decoding_time_BL": bl_result["decoding_time"],
            "mv_hat": encoded["dpb"]["mv_hat"],
            "warp_frame": encoded["dpb"]["warp_frame"],
            "context": decoded.get("context"),
        }
