"""CDF table construction + rANS coder wrappers (host side).

This is the real-bitstream counterpart of entropy.models: `update()`-time
table builders that quantize each probability model into integer CDFs, and
thin encode/decode helpers that move whole tensors between device and the
native coder in one hop.

Behavioral contracts:
  * video-side BitEstimator probing / table layout
    (`/root/reference/src/entropy_models/video_entropy_models.py:168-244`)
  * video-side Laplace scale table (`video_entropy_models.py:247-307`)
  * image-side EntropyBottleneck table (`img_entropy_models.py:436-476`)
  * image-side GaussianConditional table (`img_entropy_models.py:623-648`)

Symbol serialization order is NCHW-flat (channel-major), matching the
reference's `.reshape(-1)` on NCHW tensors, so streams are interoperable.
"""

from __future__ import annotations

import math

import numpy as np

from ..convert import P
from ..native import BufferedRansEncoder, RansDecoder, RansEncoder, pmf_to_quantized_cdf
from .models import (
    GAUSSIAN_SCALE_TABLE_IMG,
    GAUSSIAN_SCALE_TABLE_VIDEO,
    bit_estimator_forward,
    entropy_bottleneck_logits,
)


class CdfTable:
    """Padded CDF matrix + per-row sizes and symbol offsets."""

    def __init__(self, rows, pmf_lengths, offsets):
        sizes = np.asarray([len(r) for r in rows], dtype=np.int32)
        width = int(sizes.max())
        mat = np.zeros((len(rows), width), dtype=np.int32)
        for i, r in enumerate(rows):
            mat[i, :len(r)] = r
        self.cdfs = mat
        self.sizes = sizes
        self.offsets = np.asarray(offsets, dtype=np.int32).reshape(-1)


def _rows_from_pmfs(pmf, tail_mass, pmf_length):
    """Per-row quantized CDFs: row i uses pmf[i, :len_i] + its tail mass."""
    rows = []
    for i in range(pmf.shape[0]):
        prob = np.concatenate([pmf[i, :int(pmf_length[i])],
                               np.atleast_1d(tail_mass[i])]).astype(np.float32)
        rows.append(pmf_to_quantized_cdf(prob, 16))
    return rows


def _laplace_cdf(x, scale):
    return 0.5 - 0.5 * np.sign(x) * np.expm1(-np.abs(x) / scale)


def build_bit_estimator_table(params, prefix: str) -> CdfTable:
    """Probe the factorized model's support (+/-50) and quantize its CDF."""
    import jax.numpy as jnp

    p = P(params, prefix)
    channels = np.asarray(p("f1.h")).size

    def F(samples_c_l):
        # evaluate with channel on the last axis: (1, 1, L, C)
        x = jnp.asarray(samples_c_l.T[None, None, :, :], dtype=jnp.float32)
        out = bit_estimator_forward(p, x)
        return np.asarray(out[0, 0]).T  # (C, L)

    probe = np.arange(2, 51, dtype=np.float32)
    neg = F(-probe[None, :].repeat(channels, 0))  # F(-i)
    pos = F(probe[None, :].repeat(channels, 0))   # F(+i)

    minima = np.full(channels, 50, dtype=np.int64)
    maxima = np.full(channels, 50, dtype=np.int64)
    for ci in range(channels):
        lo = np.where(neg[ci] < 1e-4)[0]
        if lo.size:
            minima[ci] = int(probe[lo[0]])
        hi = np.where(pos[ci] > 0.9999)[0]
        if hi.size:
            maxima[ci] = int(probe[hi[0]])

    offset = -minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())
    samples = (np.arange(max_length, dtype=np.float32)[None, :]
               - minima[:, None].astype(np.float32))
    lower = F(samples - 0.5)
    upper = F(samples + 0.5)
    pmf = upper - lower
    # tail upper bound at the GLOBAL last sample column (max_length-1) for
    # every channel — matching `video_entropy_models.py:219`
    # `tail_mass = lower[:, 0, :1] + (1.0 - upper[:, 0, -1:])` exactly.
    # Evaluating at the per-channel support end (pmf_length-1) looks more
    # principled but produces different escape frequencies for channels
    # narrower than the widest one, breaking cross-implementation stream
    # interop (bit-exact CDF tables are the contract).
    tail_mass = lower[:, 0] + (1.0 - upper[:, -1])
    rows = _rows_from_pmfs(pmf, tail_mass, pmf_length)
    return CdfTable(rows, pmf_length, offset)


def build_laplace_table(scale_table=GAUSSIAN_SCALE_TABLE_VIDEO) -> CdfTable:
    """Video-side Laplace table over the 256-entry log scale grid."""
    scales = np.asarray(scale_table, dtype=np.float64)
    probe = np.arange(2, 51, dtype=np.float64)
    # smallest i (probing 50..2) with cdf(i) > 0.9999
    cdf_at = _laplace_cdf(probe[None, :], scales[:, None])
    pmf_center = np.full(scales.shape, 50, dtype=np.int64)
    for si in range(scales.size):
        hit = np.where(cdf_at[si] > 0.9999)[0]
        if hit.size:
            pmf_center[si] = int(probe[hit[0]])
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())
    samples = (np.arange(max_length, dtype=np.float64)[None, :]
               - pmf_center[:, None])
    upper = _laplace_cdf(samples + 0.5, scales[:, None])
    lower = _laplace_cdf(samples - 0.5, scales[:, None])
    pmf = (upper - lower).astype(np.float32)
    tail_mass = 2 * lower[:, 0]
    rows = _rows_from_pmfs(pmf, tail_mass, pmf_length)
    return CdfTable(rows, pmf_length, -pmf_center)


def build_gaussian_conditional_table(tail_mass: float = 1e-9,
                                     scale_table=GAUSSIAN_SCALE_TABLE_IMG) -> CdfTable:
    """Image-side erfc Gaussian table (`img_entropy_models.py:623-648`)."""
    from scipy.stats import norm

    scales = np.asarray(scale_table, dtype=np.float64)
    multiplier = -norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scales * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())
    samples = np.abs(np.arange(max_length, dtype=np.float64)[None, :]
                     - pmf_center[:, None])

    def std_cum(v):
        from scipy.special import erfc

        return 0.5 * erfc(-(2 ** -0.5) * v)

    upper = std_cum((0.5 - samples) / scales[:, None])
    lower = std_cum((-0.5 - samples) / scales[:, None])
    pmf = (upper - lower).astype(np.float32)
    tail = 2 * lower[:, 0]
    rows = _rows_from_pmfs(pmf, tail, pmf_length)
    return CdfTable(rows, pmf_length, -pmf_center)


def build_entropy_bottleneck_table(params, prefix: str,
                                   filters=(3, 3, 3, 3)) -> CdfTable:
    """Factorized bottleneck table from quantiles + logits MLP
    (`img_entropy_models.py:436-476`)."""
    import jax.numpy as jnp

    p = P(params, prefix)
    quantiles = np.asarray(p("quantiles"))  # (C, 1, 3)
    medians = quantiles[:, 0, 1]
    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int64), 0, None)
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int64), 0, None)
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())
    samples = (np.arange(max_length, dtype=np.float32)[None, :]
               + (medians - minima)[:, None])

    def logits(v):
        x = jnp.asarray(v[:, None, :], dtype=jnp.float32)  # (C, 1, L)
        return np.asarray(entropy_bottleneck_logits(p, x, filters))[:, 0, :]

    lower = logits(samples - 0.5)
    upper = logits(samples + 0.5)
    sign = -np.sign(lower + upper)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    pmf = np.abs(sigmoid(sign * upper) - sigmoid(sign * lower))
    # global last sample column, matching `img_entropy_models.py:472`
    # `sigmoid(lower[:, 0, :1]) + sigmoid(-upper[:, 0, -1:])` (see
    # build_bit_estimator_table for why the per-channel index is wrong)
    tail_mass = sigmoid(lower[:, 0]) + sigmoid(-upper[:, -1])
    rows = _rows_from_pmfs(pmf, tail_mass, pmf_length)
    return CdfTable(rows, pmf_length, -minima)


# ---------------------------------------------------------------------------
# serialization helpers

def nhwc_to_symbol_order(x) -> np.ndarray:
    """NHWC device array -> flat NCHW-ordered int32 host array."""
    a = np.asarray(x)
    return np.ascontiguousarray(a.transpose(0, 3, 1, 2)).reshape(-1).astype(np.int32)


def symbol_order_to_nhwc(flat: np.ndarray, shape_nhwc) -> np.ndarray:
    n, h, w, c = shape_nhwc
    return flat.reshape(n, c, h, w).transpose(0, 2, 3, 1)


def channel_indexes(shape_nhwc) -> np.ndarray:
    """Per-element channel index, NCHW-flat order."""
    n, h, w, c = shape_nhwc
    return np.repeat(np.tile(np.arange(c, dtype=np.int32), n), h * w)


class _StreamDecodeMixin:
    """Shared rANS decode methods (requires `self.decoder` and
    `self.gaussian_table`) — one implementation serves both the
    independent per-stream handles and VideoCoder's builtin decoder."""

    def decode_factorized(self, shape_nhwc, table: CdfTable) -> np.ndarray:
        indexes = channel_indexes(shape_nhwc)
        vals = self.decoder.decode_stream(indexes, table.cdfs, table.sizes,
                                          table.offsets)
        return symbol_order_to_nhwc(vals, shape_nhwc).astype(np.float32)

    def decode_gaussian(self, index_nhwc) -> np.ndarray:
        shape = np.asarray(index_nhwc).shape
        indexes = nhwc_to_symbol_order(index_nhwc)
        vals = self.decoder.decode_stream(indexes, self.gaussian_table.cdfs,
                                          self.gaussian_table.sizes,
                                          self.gaussian_table.offsets)
        return symbol_order_to_nhwc(vals, shape).astype(np.float32)


class StreamDecoder(_StreamDecodeMixin):
    """Independent decode handle over one rANS stream (own RansDecoder
    state, shared CDF tables).  Lets two layers'/frames' streams decode
    concurrently on host threads — the ctypes calls release the GIL, so
    distinct handles genuinely parallelize (pipeline.decode_sequence)."""

    def __init__(self, gaussian_table: CdfTable, string: bytes):
        self.gaussian_table = gaussian_table
        self.decoder = RansDecoder()
        self.decoder.set_stream(string)


class VideoCoder(_StreamDecodeMixin):
    """Entropy coder bundle for the video models (DMCExtend / LSSVCExtend):
    two factorized tables (z, mv_z) + one shared Laplace table."""

    def __init__(self, params):
        self.z_table = build_bit_estimator_table(params, "bit_estimator_z.")
        self.z_mv_table = build_bit_estimator_table(params, "bit_estimator_z_mv.")
        self.gaussian_table = build_laplace_table()
        self.encoder = BufferedRansEncoder()
        self.decoder = RansDecoder()

    def open_stream(self, string: bytes) -> StreamDecoder:
        """Independent decoder over `string` (does not disturb self.decoder)."""
        return StreamDecoder(self.gaussian_table, string)

    # encode side ------------------------------------------------------------

    def reset_encoder(self):
        self.encoder.reset()

    def encode_factorized(self, x_nhwc, table: CdfTable):
        symbols = nhwc_to_symbol_order(x_nhwc)
        indexes = channel_indexes(np.asarray(x_nhwc).shape)
        self.encoder.encode_with_indexes(symbols, indexes, table.cdfs,
                                         table.sizes, table.offsets)

    def encode_gaussian(self, y_q_nhwc, index_nhwc):
        symbols = nhwc_to_symbol_order(y_q_nhwc)
        indexes = nhwc_to_symbol_order(index_nhwc)
        self.encoder.encode_with_indexes(symbols, indexes,
                                         self.gaussian_table.cdfs,
                                         self.gaussian_table.sizes,
                                         self.gaussian_table.offsets)

    def flush(self) -> bytes:
        return self.encoder.flush()

    # decode side ------------------------------------------------------------

    def set_stream(self, string: bytes):
        self.decoder.set_stream(string)


class IntraCoder:
    """Entropy coder bundle for the intra models (IntraNoAR / IntraSS EL):
    EntropyBottleneck table(s) + the image Gaussian conditional table."""

    def __init__(self, params, bottleneck_prefix="entropy_bottleneck."):
        self.eb_table = build_entropy_bottleneck_table(params, bottleneck_prefix)
        self.gc_table = build_gaussian_conditional_table()
        self.medians = np.asarray(
            P(params, bottleneck_prefix)("quantiles"))[:, 0, 1]

    # EntropyBottleneck ------------------------------------------------------

    def eb_compress(self, z_nhwc) -> list:
        from ..utils.checks import assert_finite_np

        # f32 symbol boundary: in bf16 serving mode the planes arrive as
        # bfloat16, and numpy's per-op bf16 rounding of (z - med) can
        # round knife-edge values differently from XLA (which may keep
        # the subtract in excess precision).  Casting both operands to
        # f32 FIRST makes the subtract+round bit-identical between host
        # numpy and every device executable — the closed-loop stream
        # contract depends on it (bf16 intra desync, round 4).
        z = np.asarray(z_nhwc, dtype=np.float32)
        assert_finite_np("EntropyBottleneck.compress", z=z)
        med = self.medians[None, None, None, :].astype(np.float32)
        symbols = np.round(z - med).astype(np.int32)
        strings = []
        for i in range(z.shape[0]):
            enc = RansEncoder()
            s = nhwc_to_symbol_order(symbols[i:i + 1])
            idx = channel_indexes(z[i:i + 1].shape)
            strings.append(enc.encode_with_indexes(
                s, idx, self.eb_table.cdfs, self.eb_table.sizes,
                self.eb_table.offsets))
        return strings

    def eb_decompress(self, strings, hw) -> np.ndarray:
        c = self.medians.size
        shape = (len(strings), hw[0], hw[1], c)
        dec = RansDecoder()
        outs = []
        for i, s in enumerate(strings):
            dec.set_stream(s)
            idx = channel_indexes((1, hw[0], hw[1], c))
            vals = dec.decode_stream(idx, self.eb_table.cdfs,
                                     self.eb_table.sizes, self.eb_table.offsets)
            outs.append(symbol_order_to_nhwc(vals, (1, hw[0], hw[1], c)))
        out = np.concatenate(outs, axis=0).astype(np.float32)
        return out + self.medians[None, None, None, :]

    # GaussianConditional ----------------------------------------------------

    def gc_compress(self, y_nhwc, index_nhwc, means_nhwc) -> list:
        from ..utils.checks import assert_finite_np

        # f32 symbol boundary (see eb_compress): bit-identical round vs
        # the device `_y_roundtrip` under every precision mode
        y = np.asarray(y_nhwc, dtype=np.float32)
        means = np.asarray(means_nhwc, dtype=np.float32)
        assert_finite_np("GaussianConditional.compress", y=y, means=means)
        symbols = np.round(y - means).astype(np.int32)
        strings = []
        for i in range(y.shape[0]):
            enc = RansEncoder()
            strings.append(enc.encode_with_indexes(
                nhwc_to_symbol_order(symbols[i:i + 1]),
                nhwc_to_symbol_order(np.asarray(index_nhwc)[i:i + 1]),
                self.gc_table.cdfs, self.gc_table.sizes, self.gc_table.offsets))
        return strings

    def gc_decompress(self, strings, index_nhwc, means_nhwc) -> np.ndarray:
        idx = np.asarray(index_nhwc)
        dec = RansDecoder()
        outs = []
        for i, s in enumerate(strings):
            dec.set_stream(s)
            vals = dec.decode_stream(nhwc_to_symbol_order(idx[i:i + 1]),
                                     self.gc_table.cdfs, self.gc_table.sizes,
                                     self.gc_table.offsets)
            outs.append(symbol_order_to_nhwc(vals, idx[i:i + 1].shape))
        out = np.concatenate(outs, axis=0).astype(np.float32)
        return out + np.asarray(means_nhwc, dtype=np.float32)
