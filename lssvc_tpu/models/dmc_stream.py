"""DMCExtend real-bitstream paths.

Behavioral contract: `/root/reference/src/models/dmc_net_extend.py:55-147` —
stream order mv_z, mv_y, z, y in ONE buffered rANS stream per frame.

TPU-first structure: the decoder is split into 4 jitted stages at the
unavoidable entropy-decode boundaries (each decoded tensor conditions the
next priors); intermediate activations stay on device between stages.

**Closed-loop staged encoding**: the encoder derives every scale-index and
means plane by running the DECODER's own jitted stage functions on the
quantized symbol planes (int32-normalized, exactly as the decoder will see
them), with only the pure analysis transforms (ME+mv AE front, res AE front)
in encoder-only programs.  Computing priors in a separate fused encoder
program (as the torch reference does — both sides there share kernels
bit-exactly, dmc_net_extend.py:55-147) is unsafe under XLA: encoder and
decoder executables fuse differently, last-bit float differences flip
quantized scale-index buckets, and a single flipped index desynchronizes the
rANS stream for the rest of the frame.  With shared executables the encoder's
DPB is bit-identical to the decoder's by construction — `compress` returns
the true decoded-picture buffer and no verification decode is needed for
correctness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..convert import P
from ..entropy.models import build_indexes_video
from ..utils.stream import get_downsampled_shape
from . import dmc
from .components import temporal_prior_encoder_gdn
from .dmc import (
    entropy_parameters,
    hyper_decoder,
    motion_compensation,
    mv_decoder,
)


def _f32(a):
    return a.astype(jnp.float32)


@jax.jit
def _enc_mv_analysis(params, x, ref_frame):
    """Encoder-only motion analysis front: SpyNet -> mv AE -> hyper AE."""
    p = P(params)
    est_mv = dmc.me_spynet(p.sub("optic_flow"), x, ref_frame)
    mv_y = dmc.mv_encoder(p.sub("mv_encoder"), est_mv)
    mv_z = dmc.hyper_encoder(p.sub("mv_prior_encoder"), mv_y)
    ok = jnp.isfinite(mv_y).all() & jnp.isfinite(mv_z).all()
    return mv_y, jnp.round(mv_z).astype(jnp.int32), ok


@jax.jit
def _enc_res_analysis(params, x, c1, c2, c3):
    """Encoder-only residual analysis front: contextual AE -> hyper AE."""
    from .components import gdn_res_encoder

    p = P(params)
    y = gdn_res_encoder(p.sub("res_encoder"), x, c1, c2, c3)
    z = dmc.hyper_encoder(p.sub("res_prior_encoder"), y)
    ok = jnp.isfinite(y).all() & jnp.isfinite(z).all()
    return y, jnp.round(z).astype(jnp.int32), ok


@jax.jit
def _quantize_i(y, means):
    """Symbol plane: round(y - means), int32-normalized (the exact value
    domain the host coder transports and the decoder stages consume)."""
    return jnp.round(y - means).astype(jnp.int32)


def encode_device(params, x, ref_frame, ref_feature,
                  split_contexts: bool = False):
    """All device work for one BL frame, closed-loop staged (see module
    docstring).  Returns (planes, dpb); nothing crosses to the host.

    split_contexts mirrors the decoder's --decoding_profiling mode, which
    derives contexts via `_dec_stage_mv_only` + `_dec_stage_mc_only`
    instead of the fused `_dec_stage_contexts`.  The closed-loop contract
    requires the encoder to run the VERBATIM executables its decoder will
    run — differently-fused stages differ in last bits and a flipped
    quantized scale-index bucket desynchronizes the rANS stream — so
    profiled runs must flip this on the encode side too (compress() does
    it from model.profile_decoding)."""
    from ..utils.checks import finite_flags

    mv_y, mv_z_i, mv_ok = _enc_mv_analysis(params, x, ref_frame)
    mv_idx, mv_means = _dec_stage_mv_prior(params, _f32(mv_z_i))
    mv_y_q_i = _quantize_i(mv_y, mv_means)
    if split_contexts:
        mv_hat = _dec_stage_mv_only(params, _f32(mv_y_q_i), mv_means)
        c1, c2, c3 = _dec_stage_mc_only(params, mv_hat, ref_frame,
                                        ref_feature)
    else:
        mv_hat, c1, c2, c3 = _dec_stage_contexts(params, _f32(mv_y_q_i),
                                                 mv_means, ref_frame,
                                                 ref_feature)
    y, z_i, y_ok = _enc_res_analysis(params, x, c1, c2, c3)
    y_idx, y_means = _dec_stage_y_prior(params, _f32(z_i), c1, c2, c3)
    y_q_i = _quantize_i(y, y_means)
    recon, feature, y_hat = _dec_stage_recon(params, _f32(y_q_i), y_means,
                                             c1, c2, c3)
    planes = {
        # device bool scalars, checked host-side in write_planes — a
        # blocking assert here would stall dispatch of the recon stages
        "finite": finite_flags(mv_analysis=mv_ok, mv_means=mv_means,
                               res_analysis=y_ok, y_means=y_means),
        "mv_z_hat": mv_z_i,
        "mv_y_q": mv_y_q_i,
        "mv_idx": mv_idx,
        "z_hat": z_i,
        "y_q": y_q_i,
        "y_idx": y_idx,
    }
    dpb = {
        # bit-identical to what decompress reconstructs from the stream
        "ref_frame_bl": recon,
        "ref_feature_bl": feature,
        "y_hat_bl": y_hat,
        "mv_hat_bl": mv_hat,
    }
    return planes, dpb


def write_planes(coder, planes):
    """Host half: rANS-encode one BL frame's planes (order per
    dmc_net_extend.py:87-92).  Blocks on device values via np.asarray."""
    from ..utils.checks import raise_if_nonfinite

    if "finite" in planes:
        raise_if_nonfinite("DMC BL encode", planes["finite"])
    coder.reset_encoder()
    coder.encode_factorized(np.asarray(planes["mv_z_hat"]), coder.z_mv_table)
    coder.encode_gaussian(np.asarray(planes["mv_y_q"]),
                          np.asarray(planes["mv_idx"]))
    coder.encode_factorized(np.asarray(planes["z_hat"]), coder.z_table)
    coder.encode_gaussian(np.asarray(planes["y_q"]),
                          np.asarray(planes["y_idx"]))
    return coder.flush()


def compress(model, x, dpb):
    from ..utils.checks import sanitize_dpb

    dpb = sanitize_dpb(dpb)
    planes, out_dpb = encode_device(
        model.params, x, dpb["ref_frame_bl"], dpb["ref_feature_bl"],
        split_contexts=getattr(model, "profile_decoding", False))
    string = write_planes(model._coder, planes)
    return {"string": string, "dpb": out_dpb}


@jax.jit
def _dec_stage_mv_prior(params, mv_z_hat):
    p = P(params)
    mv_params = hyper_decoder(p.sub("mv_prior_decoder"), mv_z_hat)
    half = mv_params.shape[-1] // 2
    scales, means = mv_params[..., :half], mv_params[..., half:]
    return build_indexes_video(scales), means


@jax.jit
def _dec_stage_contexts(params, mv_y_q, mv_means, ref_frame, ref_feature):
    p = P(params)
    mv_y_hat = mv_y_q + mv_means
    mv_hat = mv_decoder(p.sub("mv_decoder"), mv_y_hat)
    c1, c2, c3, _ = motion_compensation(p, ref_frame, ref_feature, mv_hat)
    return mv_hat, c1, c2, c3


@jax.jit
def _dec_stage_y_prior(params, z_hat, c1, c2, c3):
    p = P(params)
    hierarchical = hyper_decoder(p.sub("res_prior_decoder"), z_hat)
    temporal = temporal_prior_encoder_gdn(p.sub("temporal_prior_encoder"),
                                          c1, c2, c3)
    gaussian_params = entropy_parameters(
        p.sub("res_entropy_parameter"),
        jnp.concatenate([temporal, hierarchical], axis=-1))
    half = gaussian_params.shape[-1] // 2
    scales, means = gaussian_params[..., :half], gaussian_params[..., half:]
    return build_indexes_video(scales), means


@jax.jit
def _dec_stage_recon(params, y_q, means, c1, c2, c3):
    from .components import gdn_res_decoder, recon_generation_simple

    p = P(params)
    y_hat = y_q + means
    recon_feature = gdn_res_decoder(p.sub("res_decoder"), y_hat, c2, c3)
    feature, recon = recon_generation_simple(p.sub("recon_generation_net"),
                                             recon_feature, c1)
    return jnp.clip(recon, 0.0, 1.0), feature, y_hat


@jax.jit
def _dec_stage_mv_only(params, mv_y_q, mv_means):
    p = P(params)
    return mv_decoder(p.sub("mv_decoder"), mv_y_q + mv_means)


@jax.jit
def _dec_stage_mc_only(params, mv_hat, ref_frame, ref_feature):
    c1, c2, c3, _ = motion_compensation(P(params), ref_frame, ref_feature,
                                        mv_hat)
    return c1, c2, c3


class _StageTimer:
    """Wall-clock stage brackets feeding the 14-key decode-profiling dict."""

    def __init__(self, profiling: dict | None):
        self.profiling = profiling
        self.t0 = None
        import time as _time

        self._time = _time
        if profiling is not None:
            self.t_start = self._time.time()

    def mark(self, key, *sync):
        if self.profiling is None:
            return
        for s in sync:
            jax.block_until_ready(s)
        now = self._time.time()
        if self.t0 is not None:
            self.profiling[self.t0[0]] += now - self.t0[1]
        self.t0 = (key, now)

    def begin(self, key):
        if self.profiling is None:
            return
        self.t0 = (key, self._time.time())

    def finish(self, *sync):
        if self.profiling is None:
            return
        for s in sync:
            jax.block_until_ready(s)
        now = self._time.time()
        if self.t0 is not None:
            self.profiling[self.t0[0]] += now - self.t0[1]
        self.profiling["overall"] += now - self.t_start
        self.profiling["frames"] += 1


def decompress(model, string, height, width, dpb):
    from ..utils.checks import sanitize_dpb

    dpb = sanitize_dpb(dpb)
    coder = model._coder
    profiling = (model.decoding_profiling
                 if getattr(model, "profile_decoding", False) else None)
    timer = _StageTimer(profiling)
    coder.set_stream(string)
    zh, zw = get_downsampled_shape(height, width, 64)

    timer.begin("entropy_dec_mv_z")
    mv_z = coder.decode_factorized((1, zh, zw, model.channel_N),
                                   coder.z_mv_table)
    timer.mark("mv_y_prior_dec")
    mv_idx, mv_means = _dec_stage_mv_prior(model.params, jnp.asarray(mv_z))
    timer.mark("entropy_dec_mv_y", mv_idx)
    mv_y_q = coder.decode_gaussian(np.asarray(mv_idx))
    if profiling is not None:
        timer.mark("mv_dec")
        mv_hat = _dec_stage_mv_only(model.params, jnp.asarray(mv_y_q), mv_means)
        timer.mark("motion_compensation_ctx_refine", mv_hat)
        c1, c2, c3 = _dec_stage_mc_only(model.params, mv_hat,
                                        dpb["ref_frame_bl"],
                                        dpb["ref_feature_bl"])
        timer.mark("entropy_dec_z", c1, c2, c3)
    else:
        mv_hat, c1, c2, c3 = _dec_stage_contexts(
            model.params, jnp.asarray(mv_y_q), mv_means,
            dpb["ref_frame_bl"], dpb["ref_feature_bl"])

    z = coder.decode_factorized((1, zh, zw, model.channel_N), coder.z_table)
    timer.mark("y_prior")
    y_idx, y_means = _dec_stage_y_prior(model.params, jnp.asarray(z),
                                        c1, c2, c3)
    timer.mark("entropy_dec_y", y_idx)
    y_q = coder.decode_gaussian(np.asarray(y_idx))
    timer.mark("res_dec")
    recon, feature, y_hat = _dec_stage_recon(model.params, jnp.asarray(y_q),
                                             y_means, c1, c2, c3)
    timer.finish(recon)
    return {
        "dpb": {
            "ref_frame_bl": recon,
            "ref_feature_bl": feature,
            "y_hat_bl": y_hat,
            "mv_hat_bl": mv_hat,
        }
    }
