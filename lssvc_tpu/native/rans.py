"""ctypes bindings for the native rANS library.

Exposes the union of the reference's binding surface (SURVEY.md §2.1):
BufferedRansEncoder (encode_with_indexes / flush / reset), one-shot
RansEncoder, RansDecoder (set_stream / set_cdf / decode_stream /
decode_with_indexes / decode_stream_only_indexes) and
pmf_to_quantized_cdf — but batch-oriented: symbols/indexes are numpy int32
arrays, CDF tables are a 2D int32 matrix.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lssvc_rans.cpp")
_LIB_PATH = os.path.join(_HERE, "liblssvc_rans.so")
_BUILD_LOCK = threading.Lock()


def _build():
    """Compile to a temp path and os.rename into place: rename is atomic
    on POSIX, so concurrent processes (jobs.run_commands workers, parallel
    test.py launches on a fresh clone) never CDLL a partially written .so;
    an inter-process flock serializes the redundant compiles themselves."""
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.rename(tmp, _LIB_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _stale():
    return (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC))


def _load():
    with _BUILD_LOCK:
        if _stale():
            import fcntl

            with open(os.path.join(_HERE, ".build.lock"), "w") as lockf:
                fcntl.flock(lockf, fcntl.LOCK_EX)
                if _stale():  # another process may have built meanwhile
                    _build()
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.rans_encoder_new.restype = ctypes.c_void_p
    lib.rans_encoder_delete.argtypes = [ctypes.c_void_p]
    lib.rans_encoder_reset.argtypes = [ctypes.c_void_p]
    lib.rans_encoder_encode_with_indexes.argtypes = [
        ctypes.c_void_p, i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int32,
        i32p, i32p]
    lib.rans_encoder_flush.argtypes = [ctypes.c_void_p]
    lib.rans_encoder_flush.restype = ctypes.c_int64
    lib.rans_encoder_get_bytes.argtypes = [ctypes.c_void_p]
    lib.rans_encoder_get_bytes.restype = u8p

    lib.rans_decoder_new.restype = ctypes.c_void_p
    lib.rans_decoder_delete.argtypes = [ctypes.c_void_p]
    lib.rans_decoder_set_stream.argtypes = [ctypes.c_void_p, u8p,
                                            ctypes.c_int64]
    lib.rans_decoder_set_cdf.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p]
    lib.rans_decoder_decode_stream.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p, ctypes.c_int32, i32p,
        i32p, i32p]
    lib.rans_decoder_decode_stream_only_indexes.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int64, i32p]

    lib.pmf_to_quantized_cdf.argtypes = [f32p, ctypes.c_int32,
                                         ctypes.c_int32, u32p]
    lib.pmf_to_quantized_cdf.restype = ctypes.c_int32
    return lib


_lib = _load()


def _i32(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _as_cdf_matrix(cdfs):
    """Accept a 2D array or list-of-lists (ragged rows zero-padded)."""
    if isinstance(cdfs, np.ndarray) and cdfs.ndim == 2:
        return _i32(cdfs)
    rows = [np.asarray(r, dtype=np.int32) for r in cdfs]
    width = max(len(r) for r in rows)
    mat = np.zeros((len(rows), width), dtype=np.int32)
    for i, r in enumerate(rows):
        mat[i, :len(r)] = r
    return mat


class BufferedRansEncoder:
    """Accumulates symbols across calls; flush() emits one reverse-coded
    stream (matches the reference's buffered encoder semantics)."""

    def __init__(self):
        self._h = _lib.rans_encoder_new()

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.rans_encoder_delete(self._h)
            self._h = None

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        symbols = _i32(symbols).ravel()
        indexes = _i32(indexes).ravel()
        assert symbols.size == indexes.size
        mat = _as_cdf_matrix(cdfs)
        sizes = _i32(cdf_sizes).ravel()
        offs = _i32(offsets).ravel()
        _lib.rans_encoder_encode_with_indexes(
            self._h, _i32p(symbols), _i32p(indexes), symbols.size,
            _i32p(mat), mat.shape[1], _i32p(sizes), _i32p(offs))

    def flush(self) -> bytes:
        n = _lib.rans_encoder_flush(self._h)
        buf = _lib.rans_encoder_get_bytes(self._h)
        return ctypes.string_at(buf, n)

    def reset(self):
        _lib.rans_encoder_reset(self._h)


class RansEncoder(BufferedRansEncoder):
    """One-shot variant: encode_with_indexes returns the stream bytes."""

    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_sizes, offsets):
        self.reset()
        super().encode_with_indexes(symbols, indexes, cdfs, cdf_sizes, offsets)
        return self.flush()


class RansDecoder:
    def __init__(self):
        self._h = _lib.rans_decoder_new()

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.rans_decoder_delete(self._h)
            self._h = None

    def set_stream(self, stream: bytes):
        buf = np.frombuffer(stream, dtype=np.uint8)
        buf = np.ascontiguousarray(buf)
        _lib.rans_decoder_set_stream(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size)

    def set_cdf(self, cdfs, cdf_sizes, offsets):
        mat = _as_cdf_matrix(cdfs)
        sizes = _i32(cdf_sizes).ravel()
        offs = _i32(offsets).ravel()
        _lib.rans_decoder_set_cdf(self._h, _i32p(mat), mat.shape[1],
                                  mat.shape[0], _i32p(sizes), _i32p(offs))

    def decode_stream(self, indexes, cdfs, cdf_sizes, offsets) -> np.ndarray:
        indexes = _i32(indexes).ravel()
        mat = _as_cdf_matrix(cdfs)
        sizes = _i32(cdf_sizes).ravel()
        offs = _i32(offsets).ravel()
        out = np.empty(indexes.size, dtype=np.int32)
        _lib.rans_decoder_decode_stream(
            self._h, _i32p(indexes), indexes.size, _i32p(mat), mat.shape[1],
            _i32p(sizes), _i32p(offs), _i32p(out))
        return out

    def decode_with_indexes(self, stream, indexes, cdfs, cdf_sizes,
                            offsets) -> np.ndarray:
        self.set_stream(stream)
        return self.decode_stream(indexes, cdfs, cdf_sizes, offsets)

    def decode_stream_only_indexes(self, indexes) -> np.ndarray:
        indexes = _i32(indexes).ravel()
        out = np.empty(indexes.size, dtype=np.int32)
        _lib.rans_decoder_decode_stream_only_indexes(
            self._h, _i32p(indexes), indexes.size, _i32p(out))
        return out


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Quantize a float PMF to an integer CDF summing to 2^precision, every
    symbol guaranteed nonzero frequency."""
    pmf = np.ascontiguousarray(np.asarray(pmf), dtype=np.float32)
    out = np.empty(pmf.size + 1, dtype=np.uint32)
    rc = _lib.pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size,
        precision, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc != 0:
        raise ValueError("pmf_to_quantized_cdf: degenerate pmf")
    return out.astype(np.int32)
