"""LSSVC enhancement-layer building blocks.

Behavioral contract: `/root/reference/src/InterModules/lssvc_modules.py` —
the channel plan g_ch = 48/64/96/96/128 for 1x/2x/4x/8x/16x scales, the
OffsetDiversity group-warp aligner, inter-layer resamplers, hybrid weight
generator, and the MV conditional coding transforms.

OffsetDiversity's 32 grouped warps run through `grouped_warp_auto` — a
Pallas windowed-gather kernel (ops/warp_pallas.py) in BLOCK channel layout
(c' = k*group_offset + j), with an exact XLA fallback via lax.cond when a
flow exceeds the kernel's displacement window.  The 1x1 fusion conv is
applied as a dense block-diagonal matmul (`_offset_fusion_scatter`) so the
interleaved->block permutation never materialises a tiny-minor-dim tensor.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import jax.numpy as jnp

from ..ops import (
    bilinear_resize,
    bilinear_upsample2,
    conv2d,
    leaky_relu,
)
from ..ops.nn import packed_width
from ..ops.warp_pallas import grouped_warp_auto
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


def _offset_fusion_scatter(group_num: int, offset_num: int, cg: int):
    """Static (C_in', C_out, U) 0/1 tensor mapping the grouped fusion conv
    onto a dense matmul over the block-layout warped tensor.

    Torch semantics (`lssvc_modules.py:90,103-110`): fusion is a 1x1 conv
    with `group_num` groups over channels c = j*cg + t (unit-major); its
    group g consumes warp units j in {offset_num*g + d} and produces
    channels [cg*g, cg*(g+1)).  Our warped tensor uses block layout
    c' = k*G + j (k = channel-in-unit), so scatter[c', o, u] = 1 iff input
    c' is the u-th in-group input of o's group."""
    go = group_num * offset_num
    c_out = group_num * cg
    u_per_group = offset_num * cg
    scat = np.zeros((go * cg, c_out, u_per_group), dtype=np.float32)
    for g in range(group_num):
        for d in range(offset_num):
            j = offset_num * g + d
            for k in range(cg):
                u = d * cg + k
                c_in = k * go + j
                scat[c_in, cg * g:cg * (g + 1), u] = 1.0
    return scat


def _aux_pair_perm(c_pair: int, c_aux: int) -> "np.ndarray":
    """Input-channel permutation for the packed aux entry conv when the
    aux tensor arrives as concat([pair_packed, mv_packed]) instead of
    pack_width(concat([c1_init, warpframe, mv])).

    pair layout (phase si, channel c'): si*c_pair + c', with c' < 3 the
    warped ref frame and c' >= 3 the warped f1 (flow_warp_pair input
    order [ref_el, f1]); mv follows at 2*c_pair + si*2 + m.  The standard
    packed aux layout is si*c_aux + c with c < c_aux-5 = c1_init,
    then warpframe (3), then mv (2).  Returns idx with idx[j] = the
    standard packed index whose value our channel j carries: pconv
    gathers the packed kernel rows so the conv consumes our layout
    directly — a trace-time constant, zero runtime cost."""
    c1 = c_aux - 5  # c1_init channels (48)
    idx = np.zeros(2 * c_pair + 4, dtype=np.int32)
    for si in range(2):
        for c in range(c_aux):
            q = si * c_aux + c  # standard packed index
            if c < c1:  # c1_init channel c -> pair channel 3 + c
                j = si * c_pair + 3 + c
            elif c < c1 + 3:  # warpframe -> pair channel c - c1
                j = si * c_pair + (c - c1)
            else:  # mv channel m, packed separately after the pair
                j = 2 * c_pair + si * 2 + (c - c1 - 3)
            idx[j] = q
    return idx


def offset_diversity(p, x, aux_feature, flow, group_num=16, offset_num=2,
                     max_residue_magnitude=40.0, aux_pair_packed=None,
                     mv_packed=None):
    """Group-wise multi-offset warp with masks (`lssvc_modules.py:75-112`).

    The reference folds 32 grouped warps through (B*32, 2, H, W) views; here
    the 32 warp units become ONE grouped-flow gather in block channel layout
    (c' = k*32 + unit), and the grouped 1x1 fusion conv becomes a dense
    block-diagonal matmul.  Rationale: XLA lowers channel-interleaving
    repeats and grouped convs through rank-5 intermediates whose tiny minor
    dims get tile-padded 20-40x at 1080p; concats + dense matmuls keep
    layouts sane and ride the MXU.
    """
    go = group_num * offset_num  # 32 warp units
    cg = x.shape[-1] // group_num  # channels per group (3)

    if aux_pair_packed is not None:
        # aux arrives ALREADY packed as (pair warp's fused packed store,
        # separately packed mv): no full-res pack relayout; the entry
        # conv's packed kernel is permuted to the concat-of-packed order
        from ..ops.packed import unpack_width
        from .packed_blocks import pconv

        c_pair = aux_pair_packed.shape[-1] // 2
        aux_p = jnp.concatenate([aux_pair_packed, mv_packed], axis=-1)
        perm = _aux_pair_perm(c_pair, c_pair + 2)
        out = unpack_width(
            pconv(p.sub("conv_offset.0"), aux_p, stride=2, in_perm=perm), 2)
    elif packed_width() == 2 and aux_feature.shape[2] % 4 == 0:
        # % 4, not % 2: the stride-2 packed conv is exact only when the
        # packed width W/2 is itself even (pack_kernel's stride contract);
        # W = 4k+2 would come out one column short (cf. me_basic's % 4
        # gate for its p=4 path).  Harness inputs are padded to multiples
        # of 16, so the packed path still covers every production shape.
        # the stride-2 entry conv reads the full-res 53ch aux tensor
        # (pads 53->128 lanes unpacked); packed it lands at 106->128.
        # Output is half-res packed -> unpack to continue plain.
        from ..ops.packed import unpack_width, pack_width
        from .packed_blocks import pconv

        out = unpack_width(
            pconv(p.sub("conv_offset.0"), pack_width(aux_feature, 2),
                  stride=2), 2)
    else:
        out = conv(p.sub("conv_offset.0"), aux_feature, stride=2)
    out = leaky_relu(out, 0.1)
    out = conv(p.sub("conv_offset.2"), out)
    out = leaky_relu(out, 0.1)
    out = conv(p.sub("conv_offset.4"), out)
    out = bilinear_upsample2(out)

    o1, o2, mask = jnp.split(out, 3, axis=-1)  # 32 ch each
    mask = jax.nn.sigmoid(mask)
    offset = max_residue_magnitude * jnp.tanh(jnp.concatenate([o1, o2], axis=-1))
    from ..ops.nn import od_offset_cap

    _cap = od_offset_cap()
    if _cap:  # serving-side outlier cap -> mid warp tier (see set_od_offset_cap)
        offset = jnp.clip(offset, -_cap, _cap)
    # offset channel 2j is unit j's dx, 2j+1 its dy; add the base flow
    flow_x = offset[..., 0::2] + flow[..., 0:1]  # (B, H, W, 32)
    flow_y = offset[..., 1::2] + flow[..., 1:2]
    if os.environ.get("LSSVC_OD_STATS"):
        # per-unit flow magnitudes decide the grouped-warp tier (tiny /
        # windowed / fallback); trained offsets are the usual reason a
        # checkpoint serves slower than random init
        jax.debug.print(
            "# od-stats: max|fx|={fx:.2f} max|fy|={fy:.2f} "
            "max|offset|={o:.2f}",
            fx=jnp.max(jnp.abs(flow_x)), fy=jnp.max(jnp.abs(flow_y)),
            o=jnp.max(jnp.abs(offset)))

    # pallas windowed grouped warp (block layout c' = k*32 + j, mask
    # applied inside) with exact XLA grouped-gather fallback for
    # out-of-window flows — the XLA path alone costs ~14 s/frame at 1080p
    warped = grouped_warp_auto(x, flow_x, flow_y, mask, group_num)

    from ..ops.nn import compute_dtype, default_conv_precision

    wg = p("fusion.weight")  # (1, 1, offset_num*cg, C_out) grouped HWIO
    scat = jnp.asarray(_offset_fusion_scatter(group_num, offset_num, cg))
    dense = jnp.einsum("uo,iou->io", wg[0, 0], scat)
    dt = compute_dtype()
    out = jnp.einsum("bhwi,io->bhwo", warped.astype(dt), dense.astype(dt),
                     precision=default_conv_precision(),
                     preferred_element_type=jnp.float32)
    return out + p("fusion.bias")


def hybrid_weight_generator(p, ctx_temp, ctx_spat):
    """Per-scale softmax blending maps (`lssvc_modules.py:115-154`).

    The 1x (48ch) and 2x (64ch) generators run width-packed in serving
    mode; the 4x generator stays plain (96ch is already lane-full)."""
    maps_t, maps_s = [], []
    for i in (1, 2, 3):
        g = p.sub(f"generator{i}")
        f = jnp.concatenate([ctx_temp[i - 1], ctx_spat[i - 1]], axis=-1)
        if packed_width() == 2 and i <= 2:
            from .packed_blocks import p_res_block, packed_region, pconv

            def stack(xp, g=g):
                fp = pconv(g.sub("0"), xp)
                fp = p_res_block(g.sub("1"), fp, end_with_relu=True)
                return pconv(g.sub("2"), fp)

            f = packed_region(f, stack)
        else:
            f = conv(g.sub("0"), f)
            f = res_block(g.sub("1"), f, end_with_relu=True)
            f = conv(g.sub("2"), f)
        wmap = jax.nn.softmax(f, axis=-1)
        maps_t.append(wmap[..., 0:1])
        maps_s.append(wmap[..., 1:2])
    return maps_t, maps_s


def _resampler_tail(p, up):
    """Full-res tail shared by the resamplers: conv_seq3 + two
    DepthConvBlock refines + residual; width-packed in serving mode."""
    if packed_width() == 2:
        from ..ops.packed import pack_width
        from .packed_blocks import p_conv_seq3, p_depth_conv_block

        fp = p_conv_seq3(p.sub("conv2"), pack_width(up, 2))
        rp = p_depth_conv_block(p.sub("feature_refine.0"), fp)
        rp = p_depth_conv_block(p.sub("feature_refine.1"), rp)
        return rp, fp  # packed (refine, f)
    f = conv_seq3(p.sub("conv2"), up)
    refine = depth_conv_block(p.sub("feature_refine.0"), f)
    refine = depth_conv_block(p.sub("feature_refine.1"), refine)
    return refine, f


def mv_resampler(p, mv_bl, shape_hr, s):
    """BL motion -> EL grid, scaled by s (`lssvc_modules.py:339-365`)."""
    f0 = conv_seq3(p.sub("conv1"), mv_bl)
    up = bilinear_resize(f0, shape_hr)
    refine, f = _resampler_tail(p, up)
    if packed_width() == 2:
        from ..ops.packed import unpack_width
        from .packed_blocks import pconv

        return s * unpack_width(pconv(p.sub("recon_conv"), refine + f), 2)
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
    refine, up_f = _resampler_tail(p, up)
    out = refine + up_f
    if packed_width() == 2:
        from ..ops.packed import unpack_width

        return unpack_width(out, 2)
    return out


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
    cat = jnp.concatenate([ctx, res], axis=-1)
    if packed_width() == 2:
        from ..ops.packed import unpack_width, pack_width
        from .packed_blocks import pconv

        f = unpack_width(pconv(p.sub("first_conv"), pack_width(cat, 2)), 2)
        f = unet(p.sub("unet_1"), f)
        f = unet(p.sub("unet_2"), f)
        recon = unpack_width(pconv(p.sub("recon_conv"), pack_width(f, 2)), 2)
        return f, recon
    f = conv(p.sub("first_conv"), cat)
    f = unet(p.sub("unet_1"), f)
    f = unet(p.sub("unet_2"), f)
    recon = conv(p.sub("recon_conv"), f)
    return f, recon
