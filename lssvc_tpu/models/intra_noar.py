"""IntraNoAR — hyperprior intra codec (base-layer image model).

Behavioral contract: `/root/reference/src/models/priors.py:112-452` — a
Cheng-style residual-block hyperprior AE at N=192 with a factorized
EntropyBottleneck on z and a Gaussian conditional on y.  The whole
forward (analysis + hyper round-trip + synthesis + bit estimation) is one
jitted NHWC program per padded resolution.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..convert import P
from ..ops import ste_round
from ..entropy.models import (
    entropy_bottleneck_forward,
    gaussian_conditional_likelihood,
)
from .base import Model
from .components import (
    conv,
    residual_block,
    residual_block_upsample,
    residual_block_with_stride,
    subpel_conv,
)

LOG2 = math.log(2.0)


def g_a(p, x):
    x = residual_block_with_stride(p.sub("0"), x)
    x = residual_block(p.sub("1"), x)
    x = residual_block_with_stride(p.sub("2"), x)
    x = residual_block(p.sub("3"), x)
    x = residual_block_with_stride(p.sub("4"), x)
    x = residual_block(p.sub("5"), x)
    return conv(p.sub("6"), x, stride=2)


def h_a(p, y):
    from ..ops import leaky_relu

    x = leaky_relu(conv(p.sub("0"), y))
    x = leaky_relu(conv(p.sub("2"), x))
    x = leaky_relu(conv(p.sub("4"), x, stride=2))
    x = leaky_relu(conv(p.sub("6"), x))
    return conv(p.sub("8"), x, stride=2)


def h_s(p, z_hat):
    from ..ops import leaky_relu

    x = leaky_relu(conv(p.sub("0"), z_hat))
    x = leaky_relu(subpel_conv(p.sub("2"), x, 2))
    x = leaky_relu(conv(p.sub("4"), x))
    x = leaky_relu(subpel_conv(p.sub("6"), x, 2))
    return conv(p.sub("8"), x)


def g_s(p, y_hat):
    x = residual_block(p.sub("0"), y_hat)
    x = residual_block_upsample(p.sub("1"), x)
    x = residual_block(p.sub("2"), x)
    x = residual_block_upsample(p.sub("3"), x)
    x = residual_block(p.sub("4"), x)
    x = residual_block_upsample(p.sub("5"), x)
    x = residual_block(p.sub("6"), x)
    return subpel_conv(p.sub("7"), x, 2)


def analysis(params, x):
    """x NHWC -> (y, z)."""
    p = P(params)
    y = g_a(p.sub("g_a"), x)
    z = h_a(p.sub("h_a"), y)
    return y, z


def hyper_synthesis_quantize(params, y, z):
    """EntropyBottleneck round-trip + Gaussian conditional quantization.

    Returns (y_hat, z_hat, y_likelihoods, z_likelihoods, scales, means).
    """
    p = P(params)
    z_hat, z_lik = entropy_bottleneck_forward(p.sub("entropy_bottleneck"), z)
    gaussian_params = h_s(p.sub("h_s"), z_hat)
    n_half = gaussian_params.shape[-1] // 2
    scales_hat = gaussian_params[..., :n_half]
    means_hat = gaussian_params[..., n_half:]
    y_hat = ste_round(y - means_hat) + means_hat
    y_lik = gaussian_conditional_likelihood(y_hat, scales_hat, means_hat)
    return y_hat, z_hat, y_lik, z_lik, scales_hat, means_hat


def forward(params, x):
    """Full eval forward. Returns x_hat, y_hat, bits and intermediates."""
    y, z = analysis(params, x)
    y_hat, z_hat, y_lik, z_lik, scales_hat, means_hat = \
        hyper_synthesis_quantize(params, y, z)
    x_hat = g_s(P(params).sub("g_s"), y_hat)
    bits = (jnp.sum(jnp.log(y_lik)) + jnp.sum(jnp.log(z_lik))) / (-LOG2)
    return {
        "x_hat": x_hat,
        "y_hat": y_hat,
        "y": y,
        "z": z,
        "z_hat": z_hat,
        "scales_hat": scales_hat,
        "means_hat": means_hat,
        "bit": bits,
    }


_forward_jit = jax.jit(forward)
_analysis_jit = jax.jit(analysis)
# module-level shared executables: compress and decompress MUST run
# the same jitted functions for their index/means planes (closed-loop
# contract, models/dmc_stream.py docstring); per-call jax.jit(...)
# wrappers also re-enter the slow dispatch path every I-frame
_hyper_params_jit = None
_synthesis_jit = None
_recon_from_yz_jit = None


class IntraNoAR(Model):
    """Wrapper with the reference-facing API (forward / encode_decode /
    compress / decompress / update / get_layer_information)."""

    def __init__(self, params: dict, N: int | None = None):
        super().__init__(params)
        self.N = N or (params["g_s.0.conv1.weight"].shape[3] if params else 192)
        self._coder = None  # built by update()

    @classmethod
    def from_torch_state_dict(cls, state_dict, **kwargs):
        state_dict = {k: v for k, v in state_dict.items()
                      if k != "gaussian_conditional.scale_table"}
        return super().from_torch_state_dict(state_dict, **kwargs)

    # -- estimated-bpp paths --------------------------------------------------

    def forward(self, x):
        return _forward_jit(self.params, x)

    def get_y_z(self, x):
        return _analysis_jit(self.params, x)

    def get_layer_information(self, x):
        """BL info for IntraSS conditioning (`priors.py:368-388`)."""
        out = self.forward(x)
        pixel_num = x.shape[0] * x.shape[1] * x.shape[2]
        mse = jnp.mean(jnp.square(x - out["x_hat"]))
        return {
            "bits": out["bit"],
            "mse": mse,
            "bpp": out["bit"] / pixel_num,
            "x_hat": out["x_hat"],
            "y_hat": out["y_hat"],
        }

    def encode_decode(self, x, output_path=None, pic_width=None,
                      pic_height=None, rdo=False, rdo_opt=None):
        if rdo:
            from .rdo import global_rdo

            y, z = self.get_y_z(x)
            y, z = global_rdo(self.params, y, z, x, rdo_opt)
            if output_path is None:
                out = _get_recon_from_yz_jit()(self.params, y, z)
                return {"bit": float(out["bit"]), "x_hat": out["x_hat"],
                        "y_hat": out["y_hat"]}
            return self._stream_encode_decode(y, z, output_path, pic_width,
                                              pic_height)
        if output_path is None:
            out = self.forward(x)
            return {"bit": float(out["bit"]), "x_hat": out["x_hat"],
                    "y_hat": out["y_hat"]}
        y, z = self.get_y_z(x)
        return self._stream_encode_decode(y, z, output_path, pic_width,
                                          pic_height)

    # -- real-bitstream paths (filled in by entropy.coder integration) --------

    def update(self, force=False):
        from ..entropy.coder import IntraCoder

        if self._coder is None or force:
            self._coder = IntraCoder(self.params)

    def compress(self, x=None, y=None, z=None, with_recon=False):
        """rANS-encode (y, z) -> {'strings': [y_strings, z_strings], 'shape'}
        (`priors.py:420-437`).

        with_recon=True additionally returns the DECODER-exact
        reconstruction ('x_hat', 'y_hat'): indexes/means already come from
        the same `_hyper_params` executable `decompress` runs on the same
        eb-round-tripped z_hat, and `_y_roundtrip`+`_synthesis` reproduce
        its remaining steps bit-exactly — so callers that condition further
        coding on the BL recon (IntraSS EL) see exactly the decoder state
        without a verification decode."""
        from ..entropy.models import build_indexes_img

        if x is not None:
            y, z = self.get_y_z(x)
        z_strings = self._coder.eb_compress(z)
        hw = (z.shape[1], z.shape[2])
        z_hat = jnp.asarray(self._coder.eb_decompress(z_strings, hw))
        scales_hat, means_hat = _get_hyper_params_jit()(self.params, z_hat)
        indexes = build_indexes_img(scales_hat)
        y_strings = self._coder.gc_compress(y, indexes, means_hat)
        out = {"strings": [y_strings, z_strings], "shape": hw}
        if with_recon:
            y_hat = _y_roundtrip_jit(y, means_hat)
            out["y_hat"] = y_hat
            out["x_hat"] = _get_synthesis_jit()(self.params, y_hat)
        return out

    def decompress(self, strings, shape):
        from ..entropy.models import build_indexes_img

        z_hat = jnp.asarray(self._coder.eb_decompress(strings[1], shape))
        scales_hat, means_hat = _get_hyper_params_jit()(self.params, z_hat)
        indexes = build_indexes_img(scales_hat)
        y_hat = jnp.asarray(self._coder.gc_decompress(strings[0], indexes,
                                                      means_hat))
        x_hat = _get_synthesis_jit()(self.params, y_hat)
        return {"x_hat": x_hat, "y_hat": y_hat}

    def _stream_encode_decode(self, y, z, output_path, pic_width, pic_height):
        from ..utils.stream import decode_i, encode_i, filesize, get_downsampled_shape

        assert pic_height is not None and pic_width is not None
        compressed = self.compress(y=y, z=z)
        encode_i(pic_height, pic_width, compressed["strings"][0][0],
                 compressed["strings"][1][0], output_path)
        bit = filesize(output_path) * 8
        height, width, y_string, z_string = decode_i(output_path)
        shape = get_downsampled_shape(height, width, 64)
        dec = self.decompress([[y_string], [z_string]], shape)
        return {"bit": bit, "x_hat": dec["x_hat"], "y_hat": dec["y_hat"]}


def _hyper_params(params, z_hat):
    gaussian_params = h_s(P(params).sub("h_s"), z_hat)
    n_half = gaussian_params.shape[-1] // 2
    return gaussian_params[..., :n_half], gaussian_params[..., n_half:]


def _synthesis(params, y_hat):
    return g_s(P(params).sub("g_s"), y_hat)


def _y_roundtrip(y, means):
    """Decoder-exact y_hat: int-normalized round(y - means) plus means —
    the value `gc_decompress` reconstructs.  Both operands are cast to
    f32 BEFORE the subtract: elementwise f32 sub/round/add is IEEE
    round-to-nearest on host numpy and XLA alike, so bit-identical — but
    in bf16 serving mode y/means arrive as bfloat16, and a bf16 subtract
    (numpy: rounded per op; XLA: possibly kept in excess precision) can
    round knife-edge symbols differently from the host coder, flipping
    prior-index buckets downstream and desynchronizing the EL stream
    (the round-4 bf16 intra NaN crash)."""
    y = y.astype(jnp.float32)
    means = means.astype(jnp.float32)
    sym = jnp.round(y - means).astype(jnp.int32)
    return sym.astype(jnp.float32) + means



_y_roundtrip_jit = jax.jit(_y_roundtrip)

def _recon_from_yz(params, y, z):
    y_hat, z_hat, y_lik, z_lik, _, _ = hyper_synthesis_quantize(params, y, z)
    x_hat = g_s(P(params).sub("g_s"), y_hat)
    bits = (jnp.sum(jnp.log(y_lik)) + jnp.sum(jnp.log(z_lik))) / (-LOG2)
    return {"x_hat": x_hat, "y_hat": y_hat, "bit": bits}


def _get_hyper_params_jit():
    global _hyper_params_jit
    if _hyper_params_jit is None:
        _hyper_params_jit = jax.jit(_hyper_params)
    return _hyper_params_jit


def _get_synthesis_jit():
    global _synthesis_jit
    if _synthesis_jit is None:
        _synthesis_jit = jax.jit(_synthesis)
    return _synthesis_jit


def _get_recon_from_yz_jit():
    global _recon_from_yz_jit
    if _recon_from_yz_jit is None:
        _recon_from_yz_jit = jax.jit(_recon_from_yz)
    return _recon_from_yz_jit
