"""rANS round-trip property tests + CDF quantizer behavior."""

import numpy as np
import pytest

from lssvc_tpu.native import (
    BufferedRansEncoder, RansDecoder, RansEncoder, pmf_to_quantized_cdf,
)


def make_gaussian_cdf_table(n_scales=8, support=16, precision=16):
    """Simple CDF table family for testing."""
    rng = np.random.default_rng(0)
    cdfs, sizes, offsets = [], [], []
    for i in range(n_scales):
        sigma = 0.3 + i
        xs = np.arange(-support, support + 1)
        pmf = np.exp(-0.5 * (xs / sigma) ** 2)
        pmf = pmf / pmf.sum() * 0.999
        tail = 1.0 - pmf.sum()
        full = np.concatenate([pmf, [tail]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(full, precision)
        cdfs.append(cdf)
        sizes.append(len(cdf))
        offsets.append(-support)
    width = max(sizes)
    mat = np.zeros((n_scales, width), dtype=np.int32)
    for i, c in enumerate(cdfs):
        mat[i, :len(c)] = c
    return mat, np.array(sizes, np.int32), np.array(offsets, np.int32)


def test_pmf_to_quantized_cdf_properties():
    pmf = np.array([0.1, 0.2, 0.0, 0.3, 0.4], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf, 16)
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) >= 1)  # every symbol has freq >= 1


def test_pmf_to_quantized_cdf_matches_reference_algorithm():
    """Cross-check against a direct numpy transcription of the quantizer."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = rng.integers(3, 60)
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum() * (1 + rng.random() * 0.1)

        cdf = pmf_to_quantized_cdf(pmf, 16).astype(np.int64)
        # independent numpy mirror
        c = np.zeros(n + 1, dtype=np.uint64)
        c[1:] = (np.round(pmf.astype(np.float64) * (1 << 16)) + 0.5).astype(np.uint64)
        total = c.sum()
        c = ((1 << 16) * c) // total
        c = np.cumsum(c)
        c[-1] = 1 << 16
        for i in range(n):
            if c[i] == c[i + 1]:
                freqs = np.diff(c)
                cand = np.where(freqs > 1)[0]
                best = cand[np.argmin(freqs[cand])]
                if best < i:
                    c[best + 1:i + 1] -= 1
                else:
                    c[i + 1:best + 1] += 1
        np.testing.assert_array_equal(cdf, c.astype(np.int64))


def test_roundtrip_in_range_symbols():
    mat, sizes, offsets = make_gaussian_cdf_table()
    rng = np.random.default_rng(2)
    n = 5000
    indexes = rng.integers(0, len(sizes), n).astype(np.int32)
    symbols = np.array([
        rng.integers(offsets[i], offsets[i] + sizes[i] - 2)
        for i in indexes], dtype=np.int32)

    enc = BufferedRansEncoder()
    enc.encode_with_indexes(symbols, indexes, mat, sizes, offsets)
    stream = enc.flush()
    assert len(stream) > 0

    dec = RansDecoder()
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, mat, sizes, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_roundtrip_bypass_out_of_range():
    """Symbols far outside the CDF support exercise the 4-bit escape path."""
    mat, sizes, offsets = make_gaussian_cdf_table()
    rng = np.random.default_rng(3)
    n = 2000
    indexes = rng.integers(0, len(sizes), n).astype(np.int32)
    symbols = rng.integers(-30000, 30000, n).astype(np.int32)

    enc = RansEncoder()
    stream = enc.encode_with_indexes(symbols, indexes, mat, sizes, offsets)
    dec = RansDecoder()
    out = dec.decode_with_indexes(stream, indexes, mat, sizes, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_multi_tensor_single_stream():
    """Several encode calls -> one flush -> sequential decode_stream calls,
    the exact pattern of the P-frame codec (mv_z, mv_y, z, y)."""
    mat, sizes, offsets = make_gaussian_cdf_table()
    rng = np.random.default_rng(4)
    tensors = []
    enc = BufferedRansEncoder()
    for _ in range(4):
        n = int(rng.integers(100, 400))
        idx = rng.integers(0, len(sizes), n).astype(np.int32)
        sym = np.array([
            rng.integers(offsets[i], offsets[i] + sizes[i] - 2)
            for i in idx], dtype=np.int32)
        tensors.append((sym, idx))
        enc.encode_with_indexes(sym, idx, mat, sizes, offsets)
    stream = enc.flush()

    dec = RansDecoder()
    dec.set_stream(stream)
    for sym, idx in tensors:
        out = dec.decode_stream(idx, mat, sizes, offsets)
        np.testing.assert_array_equal(out, sym)


def test_set_cdf_decode_only_indexes():
    mat, sizes, offsets = make_gaussian_cdf_table()
    rng = np.random.default_rng(5)
    n = 1000
    indexes = rng.integers(0, len(sizes), n).astype(np.int32)
    symbols = np.array([
        rng.integers(offsets[i], offsets[i] + sizes[i] - 2)
        for i in indexes], dtype=np.int32)
    enc = RansEncoder()
    stream = enc.encode_with_indexes(symbols, indexes, mat, sizes, offsets)
    dec = RansDecoder()
    dec.set_cdf(mat, sizes, offsets)
    dec.set_stream(stream)
    out = dec.decode_stream_only_indexes(indexes)
    np.testing.assert_array_equal(out, symbols)


def test_stream_compat_with_reference_coder():
    """If the reference C++ rANS were importable we'd cross-decode; instead,
    verify our encoder against a pure-Python rans64 decoder transcription
    (same state machine)."""
    mat, sizes, offsets = make_gaussian_cdf_table(n_scales=4, support=8)
    rng = np.random.default_rng(6)
    n = 64
    indexes = rng.integers(0, 4, n).astype(np.int32)
    symbols = np.array([
        rng.integers(offsets[i], offsets[i] + sizes[i] - 2)
        for i in indexes], dtype=np.int32)
    enc = RansEncoder()
    stream = enc.encode_with_indexes(symbols, indexes, mat, sizes, offsets)

    # pure-python rans64 decode
    words = np.frombuffer(stream + b"\x00" * 8, dtype="<u4")
    pos = 0
    x = int(words[0]) | (int(words[1]) << 32)
    pos = 2
    RANS_L = 1 << 31
    out = []
    for i in indexes:
        cdf = mat[i]
        cum = x & 0xFFFF
        s = int(np.searchsorted(cdf[:sizes[i]], cum, side="right")) - 1
        start, freq = int(cdf[s]), int(cdf[s + 1] - cdf[s])
        x = freq * (x >> 16) + (x & 0xFFFF) - start
        if x < RANS_L:
            x = (x << 32) | int(words[pos])
            pos += 1
        out.append(s + offsets[i])
    np.testing.assert_array_equal(np.array(out, np.int32), symbols)


def test_fuzz_adversarial_cdfs_and_bypass():
    """Fuzz the bypass/escape path with adversarial CDF tables: minimal-
    support tables, near-degenerate PMFs (one symbol hoarding all mass),
    many scales, and symbols far outside the coded range (deep multi-nibble
    bypass, both signs).  Round-trip must be exact for every case."""
    rng = np.random.default_rng(0xC0FFEE)
    for trial in range(60):
        n_scales = int(rng.integers(1, 12))
        cdfs, sizes, offsets = [], [], []
        for _ in range(n_scales):
            support = int(rng.integers(1, 40))
            kind = rng.integers(0, 3)
            if kind == 0:  # near-degenerate: one symbol ~ all mass
                pmf = np.full(support, 1e-7, np.float32)
                pmf[rng.integers(0, support)] = 1.0
            elif kind == 1:  # exponential skew
                pmf = np.exp(-0.5 * np.arange(support)).astype(np.float32)
            else:  # uniform-ish noise
                pmf = (rng.random(support) + 1e-4).astype(np.float32)
            pmf = pmf / pmf.sum() * (0.9 + 0.1 * rng.random())
            tail = max(1.0 - pmf.sum(), 1e-9)
            full = np.concatenate([pmf, [tail]]).astype(np.float32)
            cdf = pmf_to_quantized_cdf(full, 16)
            cdfs.append(cdf)
            sizes.append(len(cdf))
            offsets.append(int(rng.integers(-50, 10)))
        width = max(sizes)
        mat = np.zeros((n_scales, width), dtype=np.int32)
        for i, c in enumerate(cdfs):
            mat[i, :len(c)] = c
        sizes = np.array(sizes, np.int32)
        offs = np.array(offsets, np.int32)

        n = int(rng.integers(1, 300))
        indexes = rng.integers(0, n_scales, n).astype(np.int32)
        symbols = np.empty(n, np.int32)
        for j, i in enumerate(indexes):
            r = rng.random()
            lo, hi = offs[i], offs[i] + sizes[i] - 2
            if r < 0.5:  # in range
                symbols[j] = rng.integers(lo, hi + 1)
            elif r < 0.75:  # moderately out of range
                symbols[j] = rng.integers(lo - 40, hi + 41)
            else:  # extreme bypass (many nibbles), both signs
                symbols[j] = int(rng.integers(-2**28, 2**28))

        enc = RansEncoder()
        stream = enc.encode_with_indexes(symbols, indexes, mat, sizes, offs)
        dec = RansDecoder()
        out = dec.decode_with_indexes(stream, indexes, mat, sizes, offs)
        np.testing.assert_array_equal(out, symbols,
                                      err_msg=f"trial {trial}")
