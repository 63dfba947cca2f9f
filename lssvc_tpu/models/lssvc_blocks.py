"""LSSVC enhancement-layer building blocks.

Behavioral contract: `/root/reference/src/InterModules/lssvc_modules.py` —
the channel plan g_ch = 48/64/96/96/128 for 1x/2x/4x/8x/16x scales, the
OffsetDiversity group-warp aligner, inter-layer resamplers, hybrid weight
generator, and the MV conditional coding transforms.

OffsetDiversity's 32 grouped warps are folded into ONE batched flow_warp
call (batch = B * group_num * offset_num) so the TPU sees a single gather
kernel instead of a loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import (
    bilinear_resize,
    bilinear_upsample2,
    conv2d,
    flow_warp_grouped,
    leaky_relu,
)
from .components import (
    conv,
    depth_conv_block,
    gdn_p,
    res_block,
    subpel_conv,
    unet,
)


def conv_seq3(p, x, stride0=1):
    """Sequential(conv, leaky, conv) — indices 0, 2."""
    f = conv(p.sub("0"), x, stride=stride0)
    f = leaky_relu(f, 0.01)
    return conv(p.sub("2"), f)


def offset_diversity(p, x, aux_feature, flow, group_num=16, offset_num=2,
                     max_residue_magnitude=40.0):
    """Group-wise multi-offset warp with masks (`lssvc_modules.py:75-112`).

    The reference folds 32 grouped warps through (B*32, 2, H, W) views; here
    the 32 warp units become ONE grouped-flow gather over a channel-doubled
    tensor (B, H, W, 96) — no rank-5 reshapes (TPU layout assignment pads
    tiny minor dims catastrophically), one gather kernel total.

    Warp unit j in [0, 32): flow = offset channels (2j, 2j+1), mask channel
    j, feature group j % 16 — which is exactly channels [3j, 3j+3) of
    concat([x, x]).
    """
    go = group_num * offset_num  # 32 warp units

    out = conv(p.sub("conv_offset.0"), aux_feature, stride=2)
    out = leaky_relu(out, 0.1)
    out = conv(p.sub("conv_offset.2"), out)
    out = leaky_relu(out, 0.1)
    out = conv(p.sub("conv_offset.4"), out)
    out = bilinear_upsample2(out)

    o1, o2, mask = jnp.split(out, 3, axis=-1)  # 32 ch each
    mask = jax.nn.sigmoid(mask)
    offset = max_residue_magnitude * jnp.tanh(jnp.concatenate([o1, o2], axis=-1))
    # tile the base flow per unit: channel 2j += fx, 2j+1 += fy
    offset = offset + jnp.tile(flow, (1, 1, 1, go))  # (B, H, W, 64)
    flow_x = offset[..., 0::2]  # (B, H, W, 32)
    flow_y = offset[..., 1::2]

    x2 = jnp.concatenate([x, x], axis=-1)  # unit j <-> channels [3j, 3j+3)
    warped = flow_warp_grouped(x2, flow_x, flow_y)
    warped = warped * jnp.repeat(mask, x.shape[-1] // group_num, axis=-1)
    return conv2d(warped, p("fusion.weight"), p("fusion.bias"),
                  padding=0, groups=group_num)


def hybrid_weight_generator(p, ctx_temp, ctx_spat):
    """Per-scale softmax blending maps (`lssvc_modules.py:115-154`)."""
    maps_t, maps_s = [], []
    for i in (1, 2, 3):
        g = p.sub(f"generator{i}")
        f = jnp.concatenate([ctx_temp[i - 1], ctx_spat[i - 1]], axis=-1)
        f = conv(g.sub("0"), f)
        f = res_block(g.sub("1"), f, end_with_relu=True)
        f = conv(g.sub("2"), f)
        wmap = jax.nn.softmax(f, axis=-1)
        maps_t.append(wmap[..., 0:1])
        maps_s.append(wmap[..., 1:2])
    return maps_t, maps_s


def mv_resampler(p, mv_bl, shape_hr, s):
    """BL motion -> EL grid, scaled by s (`lssvc_modules.py:339-365`)."""
    f = conv_seq3(p.sub("conv1"), mv_bl)
    f = bilinear_resize(f, shape_hr)
    f = conv_seq3(p.sub("conv2"), f)
    refine = depth_conv_block(p.sub("feature_refine.0"), f)
    refine = depth_conv_block(p.sub("feature_refine.1"), refine)
    mv = conv(p.sub("recon_conv"), refine + f)
    return s * mv


def texture_resampler(p, texture_bl, shape_hr):
    """BL texture -> EL grid (`lssvc_modules.py:368-397`); adaptor choice is
    by input channel count (64 = base-layer feature)."""
    key = ("conv_adaptor.base_layer_adaptor"
           if texture_bl.shape[-1] == 64 else "conv_adaptor.enhance_layer_adaptor")
    f = conv(p.sub(key), texture_bl)
    f = conv_seq3(p.sub("conv1"), f)
    up = bilinear_resize(f, shape_hr)
    up = conv_seq3(p.sub("conv2"), up)
    refine = depth_conv_block(p.sub("feature_refine.0"), up)
    refine = depth_conv_block(p.sub("feature_refine.1"), refine)
    return refine + up


def layer_prior_resampler(p, y_hat_bl, shape_hr_16):
    """BL latent -> EL latent-grid prior (`lssvc_modules.py:400-429`)."""
    key = ("conv_adaptor.base_layer_adaptor"
           if y_hat_bl.shape[-1] == 96 else "conv_adaptor.enhance_layer_adaptor")
    f = conv(p.sub(key), y_hat_bl)
    f = conv_seq3(p.sub("conv1"), f)
    up = bilinear_resize(f, shape_hr_16)
    up = conv_seq3(p.sub("conv2"), up)
    refine = depth_conv_block(p.sub("feature_refine.0"), up)
    refine = depth_conv_block(p.sub("feature_refine.1"), refine)
    return refine + up


def prior_fusion(p, hyper_prior, temporal_prior, layer_prior):
    """Fuse three priors with two DepthConvBlocks (`lssvc_modules.py:432-442`)."""
    f = jnp.concatenate([hyper_prior, temporal_prior, layer_prior], axis=-1)
    f = depth_conv_block(p.sub("prior_fusion_conv.0"), f)
    return depth_conv_block(p.sub("prior_fusion_conv.1"), f)


def mv_res_encoder(p, mv, mv_ctx):
    """Conditional MV analysis (`lssvc_modules.py:445-469`)."""
    e1 = p.sub("encoder1")
    f = conv(e1.sub("0"), mv, stride=2)
    f = gdn_p(e1.sub("1"), f)
    f = res_block(e1.sub("2"), f, start_from_relu=False)
    f = leaky_relu(f, 0.1)
    e2 = p.sub("encoder2")
    f = jnp.concatenate([f, mv_ctx], axis=-1)
    f = conv(e2.sub("0"), f, stride=2)
    f = gdn_p(e2.sub("1"), f)
    f = res_block(e2.sub("2"), f, start_from_relu=False)
    f = leaky_relu(f, 0.1)
    f = conv(e2.sub("4"), f, stride=2)
    f = gdn_p(e2.sub("5"), f)
    f = res_block(e2.sub("6"), f, start_from_relu=False)
    f = leaky_relu(f, 0.1)
    return conv(e2.sub("8"), f, stride=2)


def mv_res_decoder(p, mv_y_hat, mv_ctx):
    """Conditional MV synthesis (`lssvc_modules.py:472-494`)."""
    d1 = p.sub("decoder1")
    f = subpel_conv(d1.sub("0"), mv_y_hat, 2)
    f = leaky_relu(f, 0.1)
    f = res_block(d1.sub("2"), f, start_from_relu=False)
    f = gdn_p(d1.sub("3"), f, inverse=True)
    f = subpel_conv(d1.sub("4"), f, 2)
    f = gdn_p(d1.sub("5"), f, inverse=True)
    f = subpel_conv(d1.sub("6"), f, 2)
    f = gdn_p(d1.sub("7"), f, inverse=True)
    d2 = p.sub("decoder2")
    f = jnp.concatenate([f, mv_ctx], axis=-1)
    f = conv(d2.sub("0"), f)
    f = leaky_relu(f, 0.1)
    return subpel_conv(d2.sub("2"), f, 2)


def mv_context_transformer(p, mv_upsample):
    f = conv(p.sub("transform.0"), mv_upsample, stride=2)
    return res_block(p.sub("transform.1"), f, start_from_relu=True)


def el_res_encoder(p, x, c1, c2, c3):
    """GDN-free conditional analysis (`lssvc_modules.py:235-254`)."""
    f = conv(p.sub("conv1"), jnp.concatenate([x, c1], axis=-1), stride=2)
    f = res_block(p.sub("res1"), jnp.concatenate([f, c2], axis=-1),
                  slope=0.1, end_with_relu=True)
    f = conv(p.sub("conv2"), f, stride=2)
    f = res_block(p.sub("res2"), jnp.concatenate([f, c3], axis=-1),
                  slope=0.1, end_with_relu=True)
    f = conv(p.sub("conv3"), f, stride=2)
    return conv(p.sub("conv4"), f, stride=2)


def el_res_decoder(p, y_hat, c2, c3):
    """GDN-free conditional synthesis (`lssvc_modules.py:257-276`)."""
    f = subpel_conv(p.sub("up1"), y_hat, 2)
    f = subpel_conv(p.sub("up2"), f, 2)
    f = res_block(p.sub("res1"), jnp.concatenate([f, c3], axis=-1),
                  slope=0.1, end_with_relu=True)
    f = subpel_conv(p.sub("up3"), f, 2)
    f = res_block(p.sub("res2"), jnp.concatenate([f, c2], axis=-1),
                  slope=0.1, end_with_relu=True)
    return subpel_conv(p.sub("up4"), f, 2)


def el_recon_generation(p, ctx, res):
    """first_conv + 2 UNets + recon conv (`lssvc_modules.py:279-292`)."""
    f = conv(p.sub("first_conv"), jnp.concatenate([ctx, res], axis=-1))
    f = unet(p.sub("unet_1"), f)
    f = unet(p.sub("unet_2"), f)
    recon = conv(p.sub("recon_conv"), f)
    return f, recon
