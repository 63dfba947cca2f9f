"""IntraSS — spatially scalable intra codec (BL = IntraNoAR, conditioned EL).

Behavioral contract: `/root/reference/src/models/IntraSS.py:74-336` — the EL
encodes the high-res frame conditioned on (a) multi-scale texture contexts
mined from the decoded BL image and (b) a layer prior resampled from the BL
latent, fused with the EL hyperprior.

All shape-dependent resampling targets (`shape_hr`, pad sizes) are static
jit arguments — one compiled program per (resolution, ratio).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..convert import P
from ..entropy.models import (
    entropy_bottleneck_forward,
    gaussian_conditional_likelihood,
)
from ..ops import bilinear_resize, leaky_relu, pad_nhwc, ste_round
from .base import Model
from . import intra_noar
from .components import (
    conv,
    feature_extractor_3scale,
    gdn_res_decoder,
    gdn_res_encoder,
    multi_scale_context_fusion,
    recon_generation_simple,
    subpel_conv,
)

LOG2 = math.log(2.0)


def texture_resampler(p, x, shape_hr):
    """conv/leaky/conv then bilinear to the EL grid (`layers.py:258-270`)."""
    f = conv(p.sub("conv_adaptor.0"), x)
    f = leaky_relu(f, 0.01)
    f = conv(p.sub("conv_adaptor.2"), f)
    return bilinear_resize(f, shape_hr)


def layer_prior_resampler(p, y_hat_bl, shape_hr):
    """BL latent -> EL latent grid prior (`layers.py:273-285`)."""
    f = conv(p.sub("conv_adaptor.0"), y_hat_bl)
    f = leaky_relu(f, 0.01)
    f = conv(p.sub("conv_adaptor.2"), f)
    return bilinear_resize(f, (shape_hr[0] // 16, shape_hr[1] // 16))


def prior_fusion(p, hyper_prior, layer_prior, context):
    """Fuse hyper + layer priors with a strided context branch
    (`layers.py:473-492`)."""
    cp = conv(p.sub("context_parameters.0"), context, stride=2)
    cp = leaky_relu(cp, 0.1)
    cp = conv(p.sub("context_parameters.2"), cp, stride=2)
    f = jnp.concatenate([hyper_prior, layer_prior, cp], axis=-1)
    f = leaky_relu(conv(p.sub("params_net.0"), f), 0.01)
    f = leaky_relu(conv(p.sub("params_net.2"), f), 0.01)
    return conv(p.sub("params_net.4"), f)


def h_a(p, y):
    x = leaky_relu(conv(p.sub("0"), y), 0.01)
    x = leaky_relu(conv(p.sub("2"), x, stride=2), 0.01)
    return conv(p.sub("4"), x, stride=2)


def h_s(p, z_hat):
    x = leaky_relu(subpel_conv(p.sub("0"), z_hat, 2), 0.01)
    x = leaky_relu(subpel_conv(p.sub("2"), x, 2), 0.01)
    return conv(p.sub("4"), x)


def context_mining(p, x_bl_hat, shape_hr):
    """Decoded BL image -> 3-scale EL contexts (`IntraSS.py:119-122`)."""
    texture = texture_resampler(p.sub("texture_resampler"), x_bl_hat, shape_hr)
    t1, t2, t3 = feature_extractor_3scale(p.sub("texture_extractor"), texture)
    return multi_scale_context_fusion(p.sub("context_fusion_net"), t1, t2, t3)


def el_analysis(params, x_el, x_bl_hat, shape_hr):
    p = P(params)
    c1, c2, c3 = context_mining(p, x_bl_hat, shape_hr)
    y = gdn_res_encoder(p.sub("g_a"), x_el, c1, c2, c3)
    z = h_a(p.sub("h_a"), y)
    return y, z, (c1, c2, c3)


def el_priors(params, z_hat, y_hat_bl, ctx3, shape_hr):
    """hyper + layer prior fusion -> (scales, means)."""
    p = P(params)
    hyper_prior = h_s(p.sub("h_s"), z_hat)
    layer_prior = layer_prior_resampler(p.sub("layer_prior_resampler"),
                                        y_hat_bl, shape_hr)
    params_out = prior_fusion(p.sub("prior_fusion_net"), hyper_prior,
                              layer_prior, ctx3)
    n_half = params_out.shape[-1] // 2
    return params_out[..., :n_half], params_out[..., n_half:]


def el_synthesis(params, y_hat, c1, c2, c3):
    p = P(params)
    res_hat = gdn_res_decoder(p.sub("g_s"), y_hat, c2, c3)
    feature, x_hat = recon_generation_simple(p.sub("recon_net"), res_hat, c1)
    return feature, x_hat


def _el_forward(params, x_el, bl_x_hat, bl_y_hat, bl_bit, shape_hr, pad_size):
    """EL estimated-bpp body shared by the analysis and RDO entry points.

    `pad_size` is applied as-is (negative entries crop) — reference
    `get_depadded_feature` (`IntraSS.py:124-135`); the harness passes zeros.
    """
    x_bl_hat = pad_nhwc(bl_x_hat, pad_size)
    y_hat_bl = pad_nhwc(bl_y_hat, tuple(int(v / 16) for v in pad_size))

    y, z, (c1, c2, c3) = el_analysis(params, x_el, x_bl_hat, shape_hr)
    p = P(params)
    z_hat, z_lik = entropy_bottleneck_forward(p.sub("entropy_bottleneck"), z)
    scales_hat, means_hat = el_priors(params, z_hat, y_hat_bl, c3, shape_hr)
    y_hat = ste_round(y - means_hat) + means_hat
    y_lik = gaussian_conditional_likelihood(y_hat, scales_hat, means_hat)
    feature, x_hat = el_synthesis(params, y_hat, c1, c2, c3)
    bit_el = (jnp.sum(jnp.log(y_lik)) + jnp.sum(jnp.log(z_lik))) / (-LOG2)
    return {
        "bit_bl": bl_bit,
        "bit_el": bit_el,
        "x_hat_bl": bl_x_hat,
        "x_hat_el": x_hat,
        "feature_el": feature,
        "y_hat_el": y_hat,
    }


def _bl_params(params):
    return {k[len("base_layer_model."):]: v for k, v in params.items()
            if k.startswith("base_layer_model.")}


@partial(jax.jit, static_argnums=(3, 4))
def forward(params, x_bl, x_el, shape_hr, pad_size):
    """Two-layer estimated-bpp forward (`IntraSS.py:137-172`)."""
    bl = intra_noar.forward(_bl_params(params), x_bl)
    return _el_forward(params, x_el, bl["x_hat"], bl["y_hat"], bl["bit"],
                       shape_hr, pad_size)


@partial(jax.jit, static_argnums=(5, 6))
def forward_from_bl_latents(params, x_el, y_bl, z_bl, _unused, shape_hr,
                            pad_size):
    """Estimated-bpp forward from externally refined BL latents — the
    RDO path (`--intra_rdo`): `models/rdo.py:global_rdo` refines (y, z)
    against the BL RD loss, then this program codes both layers from the
    refined latents (reference contract: `priors.py:315-331` feeding
    `get_y_z(rdo=True)` at `priors.py:573-576`)."""
    blp = _bl_params(params)
    y_hat, _, y_lik, z_lik, _, _ = intra_noar.hyper_synthesis_quantize(
        blp, y_bl, z_bl)
    x_hat_bl = intra_noar.g_s(P(blp).sub("g_s"), y_hat)
    bit_bl = (jnp.sum(jnp.log(y_lik)) + jnp.sum(jnp.log(z_lik))) / (-LOG2)
    return _el_forward(params, x_el, x_hat_bl, y_hat, bit_bl,
                       shape_hr, pad_size)


class IntraSS(Model):
    def __init__(self, params: dict, channel_BL: int = 192,
                 channel_N: int = 64, channel_M: int = 96):
        super().__init__(params)
        self.channel_BL = channel_BL
        self.N = channel_N
        self.M = channel_M
        self.shape_hr = (256, 256)
        self.scale_factor = 2.0
        self.pad_size = (0, 0, 0, 0)
        self._coder = None
        self._bl = None

    @classmethod
    def from_torch_state_dict(cls, state_dict, **kwargs):
        state_dict = {k: v for k, v in state_dict.items()
                      if not k.endswith("gaussian_conditional.scale_table")}
        sd = {k[7:] if k.startswith("module.") else k: v
              for k, v in state_dict.items()}
        n_bl = sd["base_layer_model.g_s.0.conv1.weight"].shape[0]
        return super().from_torch_state_dict(sd, channel_BL=int(n_bl), **kwargs)

    def set_scale_information(self, scale, shape_hr, pad_size):
        self.scale_factor = scale
        self.shape_hr = tuple(int(v) for v in shape_hr)
        self.pad_size = tuple(int(v) for v in pad_size)

    @property
    def base_layer_model(self):
        if self._bl is None:
            bl_params = {k[len("base_layer_model."):]: v
                         for k, v in self.params.items()
                         if k.startswith("base_layer_model.")}
            self._bl = intra_noar.IntraNoAR(bl_params, N=self.channel_BL)
        return self._bl

    def forward(self, x_bl, x_el, rdo=False, rdo_opt=None):
        if rdo:
            y, z = self._refined_bl_latents(x_bl, rdo_opt)
            return forward_from_bl_latents(self.params, x_el, y, z, None,
                                           self.shape_hr, self.pad_size)
        return forward(self.params, x_bl, x_el, self.shape_hr, self.pad_size)

    def _refined_bl_latents(self, x_bl, rdo_opt):
        """BL analysis latents refined by latent-domain RDO
        (`models/rdo.py`, reference `priors.py:315-331,573-576`)."""
        from .rdo import global_rdo

        bl = self.base_layer_model
        y, z = bl.get_y_z(x_bl)
        return global_rdo(bl.params, y, z, x_bl, rdo_opt)

    def encode_decode(self, x_bl, x_el, bin_path_bl, bin_path_el,
                      pic_height_bl=None, pic_width_bl=None,
                      pic_height_el=None, pic_width_el=None,
                      rdo=False, rdo_opt=None):
        if bin_path_bl is None:
            out = self.forward(x_bl, x_el, rdo=rdo, rdo_opt=rdo_opt)
            return {
                "bit_bl": float(out["bit_bl"]),
                "bit_el": float(out["bit_el"]),
                "x_hat_bl": out["x_hat_bl"],
                "x_hat_el": out["x_hat_el"],
                "feature_el": out["feature_el"],
            }
        from .intra_ss_stream import encode_decode_stream

        return encode_decode_stream(self, x_bl, x_el, bin_path_bl, bin_path_el,
                                    pic_height_bl, pic_width_bl,
                                    pic_height_el, pic_width_el,
                                    rdo=rdo, rdo_opt=rdo_opt)

    def update(self, force=False):
        from ..entropy.coder import IntraCoder

        if self._coder is None or force:
            self._coder = IntraCoder(self.params)
            self.base_layer_model.update(force=force)
