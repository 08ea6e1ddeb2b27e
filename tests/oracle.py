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


# ---------------------------------------------------------------- non-RLE
# Plain (non-run-length) codecs: compress_rowmajor{,_delta}_{8,16}b
# (sprintz_delta.cpp:64-381, :776-1010) and the 8b-only plain xff codec
# (sprintz_xff.cpp:34-628). VERDICT r3 item 4: these .o files were in the
# lib all along but unexposed, leaving PARITY rows 2/6b round-trip-only.
_SIMPLE_SYMBOLS = {
    "compress_raw_8b": ("_Z20compress_rowmajor_8bPKhjPatb", 1),
    "compress_raw_16b": ("_Z21compress_rowmajor_16bPKtjPstb", 2),
    "compress_delta_8b": ("_Z26compress_rowmajor_delta_8bPKhjPatb", 1),
    "compress_delta_16b": ("_Z27compress_rowmajor_delta_16bPKtjPstb", 2),
}

_SIMPLE_DECOMP_SYMBOLS = {
    "decompress_raw_8b": ("_Z22decompress_rowmajor_8bPKaPh", 1),
    "decompress_raw_16b": ("_Z23decompress_rowmajor_16bPKsPt", 2),
    "decompress_delta_8b": ("_Z28decompress_rowmajor_delta_8bPKaPh", 1),
    "decompress_delta_16b": ("_Z29decompress_rowmajor_delta_16bPKsPt", 2),
}


def ref_compress_simple(name: str, src: np.ndarray, ndims: int
                        ) -> tuple[bytes, int]:
    """Non-RLE reference compressor; same contract as ref_compress."""
    mangled, elem_sz = _SIMPLE_SYMBOLS[name]
    fn = getattr(_get_lib(), mangled)
    fn.restype = ctypes.c_int64
    src = np.ascontiguousarray(src)
    assert src.dtype.itemsize == elem_sz
    out = np.zeros(src.size * 2 + 4096,
                   dtype=np.int8 if elem_sz == 1 else np.int16)
    n_out = fn(src.ctypes.data_as(ctypes.c_void_p),
               ctypes.c_uint32(src.size),
               out.ctypes.data_as(ctypes.c_void_p),
               ctypes.c_uint16(ndims), ctypes.c_bool(True))
    assert n_out >= 0
    min_nbytes = int(n_out) * elem_sz
    return out.tobytes()[: min_nbytes + elem_sz - 1], min_nbytes


def ref_decompress_simple(name: str, buf: bytes, out_len_hint: int
                          ) -> np.ndarray:
    mangled, elem_sz = _SIMPLE_DECOMP_SYMBOLS[name]
    fn = getattr(_get_lib(), mangled)
    fn.restype = ctypes.c_int64
    dt = np.uint8 if elem_sz == 1 else np.uint16
    src = np.frombuffer(bytearray(buf) + b"\0" * 64, dtype=np.uint8).copy()
    out = np.zeros(out_len_hint + 4096, dtype=dt)
    n_out = fn(src.ctypes.data_as(ctypes.c_void_p),
               out.ctypes.data_as(ctypes.c_void_p))
    assert n_out >= 0
    return out[:n_out].copy()


def ref_xff_plain_compress(src: np.ndarray, ndims: int) -> bytes:
    """compress8b_rowmajor_xff (sprintz_xff.cpp:34; u8 only, u64 len)."""
    fn = getattr(_get_lib(), "_Z23compress8b_rowmajor_xffPKhmPatb")
    fn.restype = ctypes.c_int64
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.zeros(src.size * 2 + 4096, dtype=np.int8)
    n = fn(src.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint64(src.size),
           out.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint16(ndims),
           ctypes.c_bool(True))
    assert n >= 0
    return out.tobytes()[: int(n)]


def ref_xff_plain_decompress(buf: bytes, out_len_hint: int) -> np.ndarray:
    fn = getattr(_get_lib(), "_Z25decompress8b_rowmajor_xffPKaPh")
    fn.restype = ctypes.c_int64
    src = np.frombuffer(bytearray(buf) + b"\0" * 64, dtype=np.uint8).copy()
    out = np.zeros(out_len_hint + 4096, dtype=np.uint8)
    n = fn(src.ctypes.data_as(ctypes.c_void_p),
           out.ctypes.data_as(ctypes.c_void_p))
    assert n >= 0
    return out[: int(n)].copy()


# ------------------------------------------------------- transforms
# Standalone preprocessor transforms (delta.cpp, predict.cpp): unpacked
# delta / double-delta / xff-FIRE coding with the divergent
# learning_shift = elem_sz == 1 ? 1 : 3 (predict.cpp:62). VERDICT r3
# item 8. Layout per kind: {enc, dec(src,len,dest,ndims), dec_inplace}.
_TRANSFORM_SYMBOLS = {
    ("delta", 1): ("_Z24encode_delta_rowmajor_8bPKhjPatb",
                   "_Z24decode_delta_rowmajor_8bPKajPht",
                   "_Z32decode_delta_rowmajor_inplace_8bPhjt"),
    ("delta", 2): ("_Z25encode_delta_rowmajor_16bPKtjPstb",
                   "_Z25decode_delta_rowmajor_16bPKsjPtt",
                   "_Z33decode_delta_rowmajor_inplace_16bPtjt"),
    ("doubledelta", 1): ("_Z30encode_doubledelta_rowmajor_8bPKhjPatb",
                         "_Z30decode_doubledelta_rowmajor_8bPKajPht",
                         "_Z38decode_doubledelta_rowmajor_inplace_8bPhjt"),
    ("doubledelta", 2): ("_Z31encode_doubledelta_rowmajor_16bPKtjPstb",
                         "_Z31decode_doubledelta_rowmajor_16bPKsjPtt",
                         "_Z39decode_doubledelta_rowmajor_inplace_16bPtjt"),
    ("xff", 1): ("_Z22encode_xff_rowmajor_8bPKhjPatb",
                 "_Z22decode_xff_rowmajor_8bPKajPht",
                 "_Z30decode_xff_rowmajor_inplace_8bPhjt"),
    ("xff", 2): ("_Z23encode_xff_rowmajor_16bPKtjPstb",
                 "_Z23decode_xff_rowmajor_16bPKsjPtt",
                 "_Z31decode_xff_rowmajor_inplace_16bPtjt"),
}


def ref_transform_encode(kind: str, src: np.ndarray, ndims: int) -> bytes:
    elem_sz = src.dtype.itemsize
    fn = getattr(_get_lib(), _TRANSFORM_SYMBOLS[(kind, elem_sz)][0])
    fn.restype = ctypes.c_uint32
    src = np.ascontiguousarray(src)
    out = np.zeros(src.size + 4096 // elem_sz,
                   dtype=np.int8 if elem_sz == 1 else np.int16)
    n = fn(src.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint32(src.size),
           out.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint16(ndims),
           ctypes.c_bool(True))
    return out.tobytes()[: int(n) * elem_sz]


def ref_transform_decode(kind: str, elem_sz: int, buf: bytes,
                         out_len_hint: int) -> np.ndarray:
    """The (src, len, dest, ndims)=(src, dest) header-reading variant is
    ambiguous between overloads; this binds the 4-arg one and reads the
    6-byte header itself (format.h write_metadata_simple)."""
    fn = getattr(_get_lib(), _TRANSFORM_SYMBOLS[(kind, elem_sz)][1])
    fn.restype = ctypes.c_uint32
    dt = np.uint8 if elem_sz == 1 else np.uint16
    n = int.from_bytes(buf[0:4], "little")
    ndims = int.from_bytes(buf[4:6], "little")
    body = np.frombuffer(bytearray(buf[6:]) + b"\0" * 64, dtype=np.uint8)
    body = body.copy()
    out = np.zeros(out_len_hint + 4096, dtype=dt)
    n_out = fn(body.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint32(n),
               out.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint16(ndims))
    return out[: int(n_out)].copy()


def ref_transform_decode_inplace(kind: str, elem_sz: int, body: np.ndarray,
                                 n: int, ndims: int) -> np.ndarray:
    fn = getattr(_get_lib(), _TRANSFORM_SYMBOLS[(kind, elem_sz)][2])
    fn.restype = ctypes.c_uint32
    dt = np.uint8 if elem_sz == 1 else np.uint16
    buff = np.zeros(n + 4096, dtype=dt)
    buff[: body.size] = body.view(dt)
    n_out = fn(buff.ctypes.data_as(ctypes.c_void_p), ctypes.c_uint32(n),
               ctypes.c_uint16(ndims))
    return buff[: int(n_out)].copy()


# ------------------------------------------------------------------ query
# Fused query engine (sprintz_delta_rle_query.cpp:149-192,
# sprintz_xff_rle_query.cpp). The public entry points expose only the
# return count and the materialized output; the reduction STATE is local
# (dispatch_query's DUMMY_READ), so an out-of-repo shim (built below,
# same policy as the oracle lib itself) instantiates the templates with
# a state-exporting harness for direct wraparound-semantics A/B.

class _QueryParams(ctypes.Structure):
    _fields_ = [("op", ctypes.c_int), ("materialize", ctypes.c_bool)]


_QUERY_SYMBOLS = {
    ("delta", 1): "_Z27query_rowmajor_delta_rle_8bPKaPhRK11QueryParams",
    ("delta", 2): "_Z28query_rowmajor_delta_rle_16bPKsPtRK11QueryParams",
    ("xff", 1): "_Z25query_rowmajor_xff_rle_8bPKaPhRK11QueryParams",
    ("xff", 2): "_Z26query_rowmajor_xff_rle_16bPKsPtRK11QueryParams",
}


def ref_query(codec: str, elem_sz: int, buf: bytes, op: int,
              materialize: bool, out_len_hint: int):
    """Run a reference query entry point; returns (ret, dest_prefix)."""
    fn = getattr(_get_lib(), _QUERY_SYMBOLS[(codec, elem_sz)])
    fn.restype = ctypes.c_int64
    dt = np.uint8 if elem_sz == 1 else np.uint16
    src = np.frombuffer(bytearray(buf) + b"\0" * 64, dtype=np.uint8).copy()
    out = np.zeros(out_len_hint + 4096, dtype=dt)
    qp = _QueryParams(op, materialize)
    n = fn(src.ctypes.data_as(ctypes.c_void_p),
           out.ctypes.data_as(ctypes.c_void_p), ctypes.byref(qp))
    return int(n), out[: max(int(n), 0)].copy()


_SHIM_PATH = os.path.join(os.path.dirname(_LIB_PATH),
                          "libsprintz_query_shim.so")

# Out-of-repo shim source: instantiates the reference's query templates
# (headers only; nothing copied) and memcpys the reduction state out.
_SHIM_COMMON = r"""
#include <stdint.h>
#include <string.h>

#include "format.h"
#include "query.hpp"

template <class int_t, class uint_t, class Q, class RunFn>
static int64_t run_one(const int_t* src, uint_t* dest, int materialize,
                       Q& q, RunFn run) {
    uint16_t ndims; uint32_t ngroups; uint16_t remaining_len;
    src += read_metadata_rle(src, &ndims, &ngroups, &remaining_len);
    return run(src, dest, ndims, ngroups, remaining_len, materialize, q);
}

template <class int_t, class uint_t, class RunFn>
static int64_t run_typed(const int_t* src, uint_t* dest, int op,
                         int materialize, uint8_t* out_state, int64_t cap,
                         RunFn run) {
    int64_t ret;
    uint16_t ndims; uint32_t ngroups; uint16_t remaining_len;
    read_metadata_rle(src, &ndims, &ngroups, &remaining_len);
    if (op == 1) {
        MaxQuery<uint_t> q(ndims);
        ret = run_one(src, dest, materialize, q, run);
        size_t nb = q.result().size() * 32;
        memcpy(out_state, (const uint8_t*)q.result().data(),
               nb < (size_t)cap ? nb : (size_t)cap);
    } else {
        SumQuery<uint_t> q(ndims);
        ret = run_one(src, dest, materialize, q, run);
        size_t nb = q.result().size() * 32;
        memcpy(out_state, (const uint8_t*)q.result().data(),
               nb < (size_t)cap ? nb : (size_t)cap);
    }
    return ret;
}
"""

_SHIM_DELTA = _SHIM_COMMON + r"""
#include "sprintz_delta_rle_query.hpp"

struct RunDelta {
    template <class int_t, class uint_t, class Q>
    int64_t operator()(const int_t* src, uint_t* dest, uint16_t ndims,
                       uint32_t ngroups, uint16_t remaining_len,
                       int materialize, Q& q) const {
        return materialize
            ? query_rowmajor_delta_rle<true>(src, dest, ndims, ngroups,
                                             remaining_len, q)
            : query_rowmajor_delta_rle<false>(src, dest, ndims, ngroups,
                                              remaining_len, q);
    }
};

extern "C" int64_t shim_query_state_delta(
        const void* src, void* dest, int elem_sz, int op, int materialize,
        uint8_t* out_state, int64_t out_cap_bytes) {
    if (elem_sz == 1) {
        return run_typed((const int8_t*)src, (uint8_t*)dest, op,
                         materialize, out_state, out_cap_bytes, RunDelta());
    }
    return run_typed((const int16_t*)src, (uint16_t*)dest, op,
                     materialize, out_state, out_cap_bytes, RunDelta());
}
"""

_SHIM_XFF = _SHIM_COMMON + r"""
#include "sprintz_xff_rle_query.hpp"

struct RunXff {
    template <class int_t, class uint_t, class Q>
    int64_t operator()(const int_t* src, uint_t* dest, uint16_t ndims,
                       uint32_t ngroups, uint16_t remaining_len,
                       int materialize, Q& q) const {
        return materialize
            ? query_rowmajor_xff_rle<true>(src, dest, ndims, ngroups,
                                           remaining_len, q)
            : query_rowmajor_xff_rle<false>(src, dest, ndims, ngroups,
                                            remaining_len, q);
    }
};

extern "C" int64_t shim_query_state_xff(
        const void* src, void* dest, int elem_sz, int op, int materialize,
        uint8_t* out_state, int64_t out_cap_bytes) {
    if (elem_sz == 1) {
        return run_typed((const int8_t*)src, (uint8_t*)dest, op,
                         materialize, out_state, out_cap_bytes, RunXff());
    }
    return run_typed((const int16_t*)src, (uint16_t*)dest, op,
                     materialize, out_state, out_cap_bytes, RunXff());
}
"""


def ensure_query_shim() -> bool:
    """Build the state-exporting query shim next to the oracle lib."""
    if os.path.exists(_SHIM_PATH):
        return True
    if not available():
        return False
    import subprocess
    import tempfile

    ref_inc = os.environ.get("SPRINTZ_REF_SRC",
                             "/root/reference/cpp/Compress")
    if not os.path.isdir(ref_inc):
        return False
    with tempfile.TemporaryDirectory() as td:
        objs = []
        for name, code in (("shim_delta", _SHIM_DELTA),
                           ("shim_xff", _SHIM_XFF)):
            cpp = os.path.join(td, name + ".cpp")
            with open(cpp, "w") as f:
                f.write(code)
            obj = os.path.join(td, name + ".o")
            r = subprocess.run(
                ["g++", "-std=c++14", "-O2", "-march=haswell", "-fPIC",
                 "-c", "-I", ref_inc, cpp, "-o", obj],
                capture_output=True)
            if r.returncode != 0:
                import sys
                sys.stderr.write(r.stderr.decode()[-2000:])
                return False
            objs.append(obj)
        r = subprocess.run(
            ["g++", "-shared", *objs, "-o", _SHIM_PATH],
            capture_output=True)
        if r.returncode != 0:
            return False
    return True


_shim_lib = None


def ref_query_state(codec: str, elem_sz: int, buf: bytes, op: int,
                    materialize: bool, out_len_hint: int, ndims: int):
    """Run a query via the shim; returns (ret, dest_prefix, state_i32).

    state_i32: the raw reduction state as int32 words — for SumQuery the
    i32 accumulators (8 per 32-byte packet); for MaxQuery reinterpret
    per elem_sz at the call site.
    """
    global _shim_lib
    if _shim_lib is None:
        if not ensure_query_shim():
            raise RuntimeError("query shim unavailable")
        _shim_lib = ctypes.CDLL(_SHIM_PATH)
    fn = getattr(_shim_lib, f"shim_query_state_{codec}")
    fn.restype = ctypes.c_int64
    dt = np.uint8 if elem_sz == 1 else np.uint16
    src = np.frombuffer(bytearray(buf) + b"\0" * 64, dtype=np.uint8).copy()
    out = np.zeros(out_len_hint + 4096, dtype=dt)
    # generous state buffer: SumQuery u8 needs 4 packets per 32 dims + 3
    npackets = (ndims // 8 + 8)
    state = np.zeros(npackets * 8, dtype=np.int32)
    n = fn(src.ctypes.data_as(ctypes.c_void_p),
           out.ctypes.data_as(ctypes.c_void_p),
           ctypes.c_int(elem_sz),
           ctypes.c_int(op), ctypes.c_int(1 if materialize else 0),
           state.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int64(state.nbytes))
    return int(n), out[: max(int(n), 0)].copy(), state
