"""IntraSS real-bitstream path (two .bin files: BL then EL).

Behavioral contract: `/root/reference/src/models/IntraSS.py:245-336` — BL is
an IntraNoAR stream; the EL stream's priors depend on the *decoded* BL image
and latent, so decode order is BL file -> EL file.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..convert import P
from ..entropy.models import build_indexes_img
from ..ops import pad_nhwc
from ..utils.stream import decode_i, encode_i, filesize, get_downsampled_shape
from .intra_ss import (
    context_mining,
    el_analysis,
    el_priors,
    el_synthesis,
)


@partial(jax.jit, static_argnums=(3,))
def _el_analysis_jit(params, x_el, x_bl_hat, shape_hr):
    return el_analysis(params, x_el, x_bl_hat, shape_hr)


@partial(jax.jit, static_argnums=(4,))
def _el_prior_planes(params, z_hat, y_hat_bl, ctx3, shape_hr):
    scales, means = el_priors(params, z_hat, y_hat_bl, ctx3, shape_hr)
    return build_indexes_img(scales), means


@partial(jax.jit, static_argnums=(3,))
def _context_mining_jit(params, x_bl_hat, _unused, shape_hr):
    return context_mining(P(params), x_bl_hat, shape_hr)


@jax.jit
def _el_synthesis_jit(params, y_hat, c1, c2, c3):
    return el_synthesis(params, y_hat, c1, c2, c3)


def compress_stream(model, x_bl, x_el, bin_path_bl, bin_path_el,
                    pic_height_bl, pic_width_bl,
                    pic_height_el, pic_width_el, rdo=False, rdo_opt=None):
    """Encode-only IntraSS: writes both .bin files and returns the
    DECODER-exact reconstructions without a host rANS decode.

    Closed loop throughout: the BL recon/latent come from
    `IntraNoAR.compress(with_recon=True)`, the EL context and prior planes
    from the decoder's own `_context_mining_jit` / `_el_prior_planes`
    executables, and the EL y_hat from the same int-normalized round trip
    `gc_decompress` reconstructs — a last-bit divergence anywhere here
    would flip an index bucket and desynchronize the EL rANS stream (see
    dmc_stream.py docstring)."""
    from .intra_noar import _y_roundtrip_jit

    model.update()
    bl = model.base_layer_model
    shape_hr = model.shape_hr
    pad = model.pad_size

    y_bl, z_bl = bl.get_y_z(x_bl)
    if rdo:
        # latent-domain RDO on the BL before coding (`--intra_rdo`;
        # reference contract `priors.py:315-331,573-576`) — the decoder
        # is unchanged: refined latents quantize/code like any others
        from .rdo import global_rdo

        y_bl, z_bl = global_rdo(bl.params, y_bl, z_bl, x_bl, rdo_opt)
    compressed = bl.compress(y=y_bl, z=z_bl, with_recon=True)
    encode_i(pic_height_bl, pic_width_bl, compressed["strings"][0][0],
             compressed["strings"][1][0], bin_path_bl)
    bit_bl = filesize(bin_path_bl) * 8

    x_hat_bl_depad = pad_nhwc(compressed["x_hat"], pad)
    y_hat_bl_depad = pad_nhwc(compressed["y_hat"],
                              tuple(int(v / 16) for v in pad))

    y_el, z_el, _ = _el_analysis_jit(model.params, x_el, x_hat_bl_depad,
                                     shape_hr)
    # context for the EL priors comes from the decoder's own executable,
    # not from el_analysis' fused program
    c1, c2, c3 = _context_mining_jit(model.params, x_hat_bl_depad, None,
                                     shape_hr)
    z_strings = model._coder.eb_compress(z_el)
    z_hat = jnp.asarray(model._coder.eb_decompress(
        z_strings, (z_el.shape[1], z_el.shape[2])))
    idx, means = _el_prior_planes(model.params, z_hat, y_hat_bl_depad,
                                  c3, shape_hr)
    y_strings = model._coder.gc_compress(y_el, idx, means)
    encode_i(pic_height_el, pic_width_el, y_strings[0], z_strings[0],
             bin_path_el)
    bit_el = filesize(bin_path_el) * 8

    y_hat_el = _y_roundtrip_jit(y_el, means)
    feature, x_hat_el = _el_synthesis_jit(model.params, y_hat_el, c1, c2, c3)
    return {
        "bit_bl": bit_bl,
        "bit_el": bit_el,
        "x_hat_bl": compressed["x_hat"],
        "x_hat_el": x_hat_el,
        "feature_el": feature,
    }


def encode_decode_stream(model, x_bl, x_el, bin_path_bl, bin_path_el,
                         pic_height_bl, pic_width_bl,
                         pic_height_el, pic_width_el, rdo=False,
                         rdo_opt=None):
    enc = compress_stream(model, x_bl, x_el, bin_path_bl, bin_path_el,
                          pic_height_bl, pic_width_bl,
                          pic_height_el, pic_width_el, rdo=rdo,
                          rdo_opt=rdo_opt)
    dec = decompress_stream(model, bin_path_bl, bin_path_el)
    dec["bit_bl"] = enc["bit_bl"]
    dec["bit_el"] = enc["bit_el"]
    return dec


def decompress_stream(model, bin_path_bl, bin_path_el):
    """Decode-only IntraSS: reconstruct both layers from the two .bin
    files (the decoder half of `encode_decode_stream`; drives the
    standalone decoder CLI)."""
    model.update()
    bl = model.base_layer_model
    shape_hr = model.shape_hr
    pad = model.pad_size

    h_bl, w_bl, y_str_bl, z_str_bl = decode_i(bin_path_bl)
    shape_bl = get_downsampled_shape(h_bl, w_bl, 64)
    dec_bl = bl.decompress([[y_str_bl], [z_str_bl]], shape_bl)
    x_hat_bl = dec_bl["x_hat"]
    y_hat_bl = dec_bl["y_hat"]
    x_hat_bl_depad = pad_nhwc(x_hat_bl, pad)
    y_hat_bl_depad = pad_nhwc(y_hat_bl, tuple(int(v / 16) for v in pad))

    h_el, w_el, y_str_el, z_str_el = decode_i(bin_path_el)
    c1, c2, c3 = _context_mining_jit(model.params, x_hat_bl_depad, None,
                                     shape_hr)
    z_hat = jnp.asarray(model._coder.eb_decompress(
        [z_str_el], get_downsampled_shape(h_el, w_el, 64)))
    idx, means = _el_prior_planes(model.params, z_hat, y_hat_bl_depad, c3,
                                  shape_hr)
    y_hat = jnp.asarray(model._coder.gc_decompress([y_str_el], idx, means))
    feature, x_hat_el = _el_synthesis_jit(model.params, y_hat, c1, c2, c3)

    return {
        "x_hat_bl": x_hat_bl,
        "x_hat_el": x_hat_el,
        "feature_el": feature,
    }
