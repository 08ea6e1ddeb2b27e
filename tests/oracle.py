"""Optional ctypes bridge to a locally-compiled reference sprintz library.

If ``SPRINTZ_REF_LIB`` (or /tmp/refbuild/libsprintz_ref.so) exists, tests can
compare this framework's streams byte-for-byte against the reference
implementation. The library is built OUT of this repo from the read-only
reference checkout; nothing here ships reference code.

Build (x86-64 with AVX2+BMI2 only):
    mkdir -p /tmp/refbuild && cd /tmp/refbuild
    for f in format sprintz sprintz_delta sprintz_delta_rle \
             sprintz_delta_lowdim sprintz_xff sprintz_xff_rle \
             sprintz_xff_lowdim delta predict online univariate_8b \
             sprintz_delta_rle_query sprintz_xff_rle_query; do
        g++ -std=c++14 -O2 -march=haswell -fPIC -c \
            /root/reference/cpp/Compress/$f.cpp -o $f.o
    done
    g++ -shared -o libsprintz_ref.so *.o
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.environ.get("SPRINTZ_REF_LIB", "/tmp/refbuild/libsprintz_ref.so")

# Itanium-mangled names of the reference entry points we exercise.
_SYMBOLS = {
    # name -> (mangled, elem_sz)
    "compress_delta_rle_8b": ("_Z30compress_rowmajor_delta_rle_8bPKhjPatb", 1),
    "compress_delta_rle_16b": ("_Z31compress_rowmajor_delta_rle_16bPKtjPstb", 2),
    "compress_xff_rle_8b": ("_Z28compress_rowmajor_xff_rle_8bPKhjPatb", 1),
    "compress_xff_rle_16b": ("_Z29compress_rowmajor_xff_rle_16bPKtjPstb", 2),
    "compress_delta_rle_lowdim_8b": (
        "_Z37compress_rowmajor_delta_rle_lowdim_8bPKhjPatb", 1),
    "compress_delta_rle_lowdim_16b": (
        "_Z38compress_rowmajor_delta_rle_lowdim_16bPKtjPstb", 2),
    "compress_xff_rle_lowdim_8b": (
        "_Z35compress_rowmajor_xff_rle_lowdim_8bPKhjPatb", 1),
    "compress_xff_rle_lowdim_16b": (
        "_Z36compress_rowmajor_xff_rle_lowdim_16bPKtjPstb", 2),
    "sprintz_compress_delta_8b": ("_Z25sprintz_compress_delta_8bPKhjPatb", 1),
    "sprintz_compress_delta_16b": ("_Z26sprintz_compress_delta_16bPKtjPstb", 2),
    "sprintz_compress_xff_8b": ("_Z23sprintz_compress_xff_8bPKhjPatb", 1),
    "sprintz_compress_xff_16b": ("_Z24sprintz_compress_xff_16bPKtjPstb", 2),
}

_DECOMP_SYMBOLS = {
    "decompress_delta_rle_8b": ("_Z32decompress_rowmajor_delta_rle_8bPKaPh", 1),
    "decompress_delta_rle_16b": ("_Z33decompress_rowmajor_delta_rle_16bPKsPt", 2),
    "decompress_xff_rle_8b": ("_Z30decompress_rowmajor_xff_rle_8bPKaPh", 1),
    "decompress_xff_rle_16b": ("_Z31decompress_rowmajor_xff_rle_16bPKsPt", 2),
    "sprintz_decompress_delta_8b": ("_Z27sprintz_decompress_delta_8bPKaPh", 1),
    "sprintz_decompress_delta_16b": ("_Z28sprintz_decompress_delta_16bPKsPt", 2),
    "sprintz_decompress_xff_8b": ("_Z25sprintz_decompress_xff_8bPKaPh", 1),
    "sprintz_decompress_xff_16b": ("_Z26sprintz_decompress_xff_16bPKsPt", 2),
}


def available() -> bool:
    return os.path.exists(_LIB_PATH)


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_LIB_PATH)
    return _lib


def ref_compress(name: str, src: np.ndarray, ndims: int) -> tuple[bytes, int]:
    """Run a reference compressor.

    Returns ``(buf, min_nbytes)`` where ``buf`` holds the output buffer
    prefix and ``min_nbytes = n_out_elements * elem_sz``. The reference
    reports compressed length in *elements*, flooring a trailing odd byte
    for 16-bit streams, so the true stream may be up to ``elem_sz - 1``
    bytes longer than ``min_nbytes``; ``buf`` includes that slack.
    """
    mangled, elem_sz = _SYMBOLS[name]
    fn = getattr(_get_lib(), mangled)
    fn.restype = ctypes.c_int64
    src = np.ascontiguousarray(src)
    assert src.dtype.itemsize == elem_sz
    # generous output bound: the reference tests use sz*3/2 + 64
    out = np.zeros(src.size * 2 + 4096, dtype=np.int8 if elem_sz == 1 else np.int16)
    n_out = fn(
        src.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_uint32(src.size),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_uint16(ndims),
        ctypes.c_bool(True),
    )
    assert n_out >= 0
    min_nbytes = int(n_out) * elem_sz
    return out.tobytes()[: min_nbytes + elem_sz - 1], min_nbytes


def assert_stream_matches(mine: bytes, ref: tuple[bytes, int], ctx: str = ""):
    """Assert ``mine`` equals the reference stream modulo its floored length."""
    buf, min_nbytes = ref
    assert min_nbytes <= len(mine) <= len(buf), (
        f"{ctx}: stream length {len(mine)} outside [{min_nbytes}, {len(buf)}]")
    assert mine == buf[: len(mine)], (
        f"{ctx}: first byte mismatch at "
        f"{next(i for i in range(len(mine)) if mine[i] != buf[i])}")


def ref_decompress(name: str, buf: bytes, out_len_hint: int) -> np.ndarray:
    """Run a reference decompressor; returns the decoded elements."""
    mangled, elem_sz = _DECOMP_SYMBOLS[name]
    fn = getattr(_get_lib(), mangled)
    fn.restype = ctypes.c_int64
    dt = np.uint8 if elem_sz == 1 else np.uint16
    src = np.frombuffer(buf, dtype=np.uint8).copy()
    out = np.zeros(out_len_hint + 4096, dtype=dt)
    n_out = fn(
        src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    assert n_out >= 0
    return out[:n_out].copy()


def ref_dyndelta_compress(src: np.ndarray) -> bytes:
    """compress8b_dyndelta (univariate_8b.cpp:1523), write_size=True."""
    fn = getattr(_get_lib(), "_Z19compress8b_dyndeltaPhmPab")
    fn.restype = ctypes.c_int64
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.zeros(src.size * 2 + 4096, dtype=np.int8)
    n = fn(src.ctypes.data_as(ctypes.c_void_p),
           ctypes.c_size_t(src.size),
           out.ctypes.data_as(ctypes.c_void_p),
           ctypes.c_bool(True))
    assert n >= 0
    return out.tobytes()[: int(n)]


def ref_dyndelta_decompress(buf: bytes, out_len: int) -> np.ndarray:
    fn = getattr(_get_lib(), "_Z21decompress8b_dyndeltaPaPh")
    fn.restype = ctypes.c_int64
    src = np.frombuffer(bytearray(buf) + b"\0" * 8, dtype=np.int8).copy()
    out = np.zeros(out_len + 64, dtype=np.uint8)
    n = fn(src.ctypes.data_as(ctypes.c_void_p),
           out.ctypes.data_as(ctypes.c_void_p))
    return out[: int(n)]


_UNIVARIATE_SYMBOLS = {
    "delta8b": ("_Z16compress8b_deltaPhmPab", "_Z18decompress8b_deltaPaPh"),
    "doubledelta8b": ("_Z22compress8b_doubledeltaPhmPab",
                      "_Z24decompress8b_doubledeltaPaPh"),
    "delta_simple8b": ("_Z23compress8b_delta_simplePhmPab", None),
    "delta_rle8b": ("_Z20compress8b_delta_rlePhmPab",
                    "_Z22decompress8b_delta_rlePaPh"),
    "delta_rle28b": ("_Z21compress8b_delta_rle2PhmPab",
                     "_Z23decompress8b_delta_rle2PaPh"),
    # NOTE: the reference's own decompress8b_online is a documented
    # speed-hack (wrong mask table, univariate_8b.cpp "XXX this masks
    # array can't handle negative numbers") -> encode-only oracle
    "online8b": ("_Z17compress8b_onlinePhmPab", None),
    "delta_online8b": ("_Z23compress8b_delta_onlinePhmPab",
                       "_Z25decompress8b_delta_onlinePaPh"),
    "delta2_online8b": ("_Z24compress8b_delta2_onlinePhmPab",
                        "_Z26decompress8b_delta2_onlinePaPh"),
    "dyndelta8b": ("_Z19compress8b_dyndeltaPhmPab",
                   "_Z21decompress8b_dyndeltaPaPh"),
}


def ref_univariate_compress(name: str, src: np.ndarray) -> bytes:
    fn = getattr(_get_lib(), _UNIVARIATE_SYMBOLS[name][0])
    fn.restype = ctypes.c_int64
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.zeros(src.size * 2 + 4096, dtype=np.int8)
    n = fn(src.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(src.size),
           out.ctypes.data_as(ctypes.c_void_p), ctypes.c_bool(True))
    assert n >= 0
    return out.tobytes()[: int(n)]


def ref_univariate_decompress(name: str, buf: bytes, out_len: int
                              ) -> np.ndarray:
    fn = getattr(_get_lib(), _UNIVARIATE_SYMBOLS[name][1])
    fn.restype = ctypes.c_int64
    src = np.frombuffer(bytearray(buf) + b"\0" * 8, dtype=np.int8).copy()
    out = np.zeros(out_len + 64, dtype=np.uint8)
    n = fn(src.ctypes.data_as(ctypes.c_void_p),
           out.ctypes.data_as(ctypes.c_void_p))
    return out[: int(n)]
