"""Cheng2020Anchor — autoregressive-context hyperprior image codec.

Behavioral contract: `/root/reference/src/models/priors.py:455-799` — the
IntraNoAR transform stack plus a masked-conv context model whose entropy
parameters combine hyperprior and causal context.  Registered in
`model_architectures` for API parity (the reference never wires it into the
harness either, SURVEY.md §2.2 #21).

The estimated-bpp forward is one jitted program (the masked conv is a plain
conv with a constant-masked kernel).  compress/decompress are honest serial
implementations: the causal dependency forces per-pixel decoding, which we
run entirely on the host (numpy) against the rANS coder — no per-pixel
device round-trips.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..convert import P
from ..entropy.models import (
    entropy_bottleneck_forward,
    gaussian_conditional_likelihood,
)
from ..ops import conv2d, ste_round
from .base import Model
from .intra_noar import g_a, g_s, h_a, h_s

LOG2 = math.log(2.0)


def _mask_kernel(w):
    """Zero the 'future' taps of an HWIO 5x5 kernel (PixelCNN mask A)."""
    kh, kw = w.shape[0], w.shape[1]
    mask = np.ones((kh, kw, 1, 1), dtype=np.float32)
    mask[kh // 2, kw // 2:, :, :] = 0
    mask[kh // 2 + 1:, :, :, :] = 0
    return w * jnp.asarray(mask)


def entropy_parameters(p, x):
    from ..ops import leaky_relu

    x = leaky_relu(conv2d(x, p("0.weight"), p("0.bias"), padding=0))
    x = leaky_relu(conv2d(x, p("2.weight"), p("2.bias"), padding=0))
    return conv2d(x, p("4.weight"), p("4.bias"), padding=0)


def forward(params, x):
    p = P(params)
    y = g_a(p.sub("g_a"), x)
    z = h_a(p.sub("h_a"), y)
    z_hat, z_lik = entropy_bottleneck_forward(p.sub("entropy_bottleneck"), z)
    hyper = h_s(p.sub("h_s"), z_hat)

    y_hat = ste_round(y)
    ctx_w = _mask_kernel(p("context_prediction.weight"))
    ctx_p = conv2d(y_hat, ctx_w, p("context_prediction.bias"), padding=2)
    gaussian_params = entropy_parameters(
        p.sub("entropy_parameters"), jnp.concatenate([hyper, ctx_p], axis=-1))
    half = gaussian_params.shape[-1] // 2
    scales_hat = gaussian_params[..., :half]
    means_hat = gaussian_params[..., half:]
    # likelihood at round(y - means) + means — the reference evaluates
    # `gaussian_conditional(y, scales, means=means_hat)` (priors.py:545,
    # eval quantize mode "dequantize"); round(y) feeds only the context
    # model and g_s.  Evaluating at round(y) was up to half a bin off per
    # element and disagreed with what compress() actually codes.
    y_q = ste_round(y - means_hat) + means_hat
    y_lik = gaussian_conditional_likelihood(y_q, scales_hat, means_hat)
    x_hat = g_s(p.sub("g_s"), y_hat)
    bit = (jnp.sum(jnp.log(y_lik)) + jnp.sum(jnp.log(z_lik))) / (-LOG2)
    return {"x_hat": x_hat, "y_hat": y_hat, "bit": bit,
            "likelihoods": {"y": y_lik, "z": z_lik}}


_forward_jit = jax.jit(forward)


def _rec_only(params, x):
    p = P(params)
    y_hat = ste_round(g_a(p.sub("g_a"), x))
    return g_s(p.sub("g_s"), y_hat), y_hat


_rec_only_jit = jax.jit(_rec_only)


class Cheng2020Anchor(Model):
    def __init__(self, params: dict, N: int = 192, leaky_relu_slope=0.01):
        super().__init__(params)
        if abs(float(leaky_relu_slope) - 0.01) > 1e-12:
            # the forward helpers and the host per-pixel entropy stack all
            # use the default 0.01; silently ignoring a custom slope would
            # decode a differently-trained checkpoint with wrong activations
            raise NotImplementedError(
                "Cheng2020Anchor supports leaky_relu_slope=0.01 only")
        self.N = N
        self._coder = None

    @classmethod
    def from_torch_state_dict(cls, state_dict, **kwargs):
        state_dict = {k: v for k, v in state_dict.items()
                      if k != "gaussian_conditional.scale_table"}
        m = super().from_torch_state_dict(state_dict, **kwargs)
        m.N = int(m.params["g_s.0.conv1.weight"].shape[3])
        return m

    from_state_dict = from_torch_state_dict

    def forward(self, x):
        return _forward_jit(self.params, x)

    def get_rec_only(self, x):
        """g_a -> round -> g_s only (`priors.py:553-561`) — no entropy
        stack (context conv + likelihood reductions) on this query."""
        out = _rec_only_jit(self.params, x)
        return {"x_hat": out[0], "y_hat": out[1]}

    def encode_decode(self, x, output_path=None, pic_width=None,
                      pic_height=None, rdo=False, rdo_opt=None):
        if rdo:
            import warnings

            warnings.warn("RDO is not supported for Cheng2020Anchor.")
        if output_path is None:
            out = self.forward(x)
            return {"bit": float(out["bit"]), "x_hat": out["x_hat"]}
        from ..utils.stream import decode_i, encode_i, filesize, get_downsampled_shape

        compressed = self.compress(x=x)
        encode_i(pic_height, pic_width, compressed["strings"][0][0],
                 compressed["strings"][1][0], output_path)
        bit = filesize(output_path) * 8
        height, width, y_string, z_string = decode_i(output_path)
        dec = self.decompress([[y_string], [z_string]],
                              get_downsampled_shape(height, width, 64))
        return {"bit": bit, "x_hat": dec["x_hat"]}

    def update(self, force=False):
        from ..entropy.coder import IntraCoder

        if self._coder is None or force:
            self._coder = IntraCoder(self.params)

    # -- serial autoregressive coding (host side) -----------------------------

    def _host_weights(self):
        """Pull the context/entropy-parameter weights to numpy once."""
        p = self.params
        ctx_w = np.asarray(_mask_kernel(p["context_prediction.weight"]))
        return {
            "ctx_w": ctx_w,  # (5, 5, N, 2N) HWIO
            "ctx_b": np.asarray(p["context_prediction.bias"]),
            "ep": [(np.asarray(p[f"entropy_parameters.{i}.weight"]),
                    np.asarray(p[f"entropy_parameters.{i}.bias"]))
                   for i in (0, 2, 4)],
        }

    @staticmethod
    def _indexes_np(scales):
        """Host mirror of entropy.models.build_indexes_img (incl. the
        reference's +1 bias) — the autoregressive loops are per-pixel, and
        a jnp round-trip here would be one device dispatch per pixel."""
        log_min = math.log(0.11)
        step = (math.log(256.0) - log_min) / (64 - 1)
        idx = (np.log(np.maximum(scales, 1e-5)) - log_min) / step + 1
        return np.clip(idx, 0, 63).astype(np.int32)

    @staticmethod
    def _entropy_params_pixel(w, ctx_vec, hyper_vec):
        """1x1 entropy-parameter stack on a single pixel vector."""
        v = np.concatenate([hyper_vec, ctx_vec])
        for i, (wk, bk) in enumerate(w["ep"]):
            v = v @ wk[0, 0] + bk
            if i < 2:
                v = np.where(v >= 0, v, 0.01 * v)
        half = v.shape[0] // 2
        return v[:half], v[half:]

    def compress(self, x=None, y=None, z=None):
        from ..native import BufferedRansEncoder

        p = P(self.params)
        if x is not None:
            y = g_a(p.sub("g_a"), x)
            z = h_a(p.sub("h_a"), y)
        z_strings = self._coder.eb_compress(z)
        z_hat = jnp.asarray(self._coder.eb_decompress(
            z_strings, (z.shape[1], z.shape[2])))
        hyper = np.asarray(h_s(p.sub("h_s"), z_hat))

        w = self._host_weights()
        y_np = np.asarray(y)
        n, yh, yw, c = y_np.shape
        pad = 2
        gc = self._coder.gc_table
        y_strings, y_hats = [], []
        for b in range(n):
            y_hat = np.zeros((yh + 2 * pad, yw + 2 * pad, c), np.float32)
            syms, idxs = [], []
            for i in range(yh):
                for j in range(yw):
                    crop = y_hat[i:i + 5, j:j + 5, :]
                    ctx = np.einsum("hwc,hwcd->d", crop, w["ctx_w"]) + w["ctx_b"]
                    scales, means = self._entropy_params_pixel(
                        w, ctx, hyper[b, i, j])
                    idx = self._indexes_np(scales)
                    q = np.round(y_np[b, i, j] - means)
                    y_hat[i + pad, j + pad] = q + means
                    syms.append(q.astype(np.int32))
                    idxs.append(idx.astype(np.int32))
            enc = BufferedRansEncoder()
            enc.encode_with_indexes(np.concatenate(syms),
                                    np.concatenate(idxs), gc.cdfs, gc.sizes,
                                    gc.offsets)
            y_strings.append(enc.flush())
            y_hats.append(y_hat[pad:-pad, pad:-pad])
        # "y_hat": the encoder's decoded latents (what decompress must
        # reproduce bit-for-bit) — returned explicitly instead of stashed
        # as hidden instance state
        return {"strings": [y_strings, z_strings],
                "shape": (z.shape[1], z.shape[2]),
                "y_hat": np.stack(y_hats)}

    def decompress(self, strings, shape):
        from ..native import RansDecoder

        p = P(self.params)
        z_hat = jnp.asarray(self._coder.eb_decompress(strings[1], shape))
        hyper = np.asarray(h_s(p.sub("h_s"), z_hat))

        w = self._host_weights()
        yh, yw = shape[0] * 4, shape[1] * 4
        c = self.N
        pad = 2
        gc = self._coder.gc_table
        outs = []
        for b, stream in enumerate(strings[0]):
            dec = RansDecoder()
            dec.set_stream(stream)
            y_hat = np.zeros((yh + 2 * pad, yw + 2 * pad, c), np.float32)
            for i in range(yh):
                for j in range(yw):
                    crop = y_hat[i:i + 5, j:j + 5, :]
                    ctx = np.einsum("hwc,hwcd->d", crop, w["ctx_w"]) + w["ctx_b"]
                    scales, means = self._entropy_params_pixel(
                        w, ctx, hyper[b, i, j])
                    idx = self._indexes_np(scales)
                    q = dec.decode_stream(idx, gc.cdfs,
                                          gc.sizes, gc.offsets)
                    y_hat[i + pad, j + pad] = q + means
            outs.append(y_hat[pad:-pad, pad:-pad])
        y_hat = jnp.asarray(np.stack(outs))
        x_hat = jnp.clip(g_s(p.sub("g_s"), y_hat), 0.0, 1.0)
        return {"x_hat": x_hat, "y_hat": y_hat}
