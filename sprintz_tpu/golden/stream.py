"""Generic Sprintz stream state machine (groups, headers, zero-run RLE).

The group/RLE structure is shared by every multivariate codec; what varies
per variant is (a) the forecaster and (b) the block payload layout:

- row-major (sprintz_delta_rle.cpp / sprintz_xff_rle.cpp): rows are packed
  across dims with byte-aligned rows; per-dim widths use the
  promote-7-to-8 mask LUT, and 16-bit widths keep a full low byte whenever
  any high bit is set.
- lowdim column-major (sprintz_delta_lowdim.cpp / sprintz_xff_lowdim.cpp):
  each dim's 8 samples are packed contiguously (8*w bits == w bytes, so no
  cross-dim bit offsets); widths are the raw bit length with only the
  (elem_bits-1) -> elem_bits promotion.

Run-continuation boundary condition: the row-major xff encoder continues a
run when exactly one group of data remains (`<=`, sprintz_xff_rle.cpp:362);
the other three encoders use strict `<` (sprintz_delta_rle.cpp:226,
sprintz_delta_lowdim.cpp:190, sprintz_xff_lowdim.cpp:234).
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    BLOCK_SZ,
    DEFAULT_CONFIG,
    GROUP_SZ_BLOCKS,
    MAX_RUN_NBLOCKS,
    METADATA_LEN_RLE,
    MIN_DATA_SIZE,
    NBITS_MASKS_U8,
    CodecConfig,
    nbits_sz_bits,
    uint_dtype,
)
from ..utils.bits import (
    decode_run_varint,
    encode_run_varint,
    pack_row_bits,
    unpack_row_bits,
)
from .predictors import DeltaPredictor, FirePredictor


def write_metadata_rle(ngroups: int, remaining_len: int, ndims: int) -> bytes:
    """8-byte stream header {u32 ngroups, u16 remaining_len, u16 ndims} LE
    (format.h:35-45)."""
    out = bytearray(METADATA_LEN_RLE)
    out[0:4] = int(ngroups).to_bytes(4, "little")
    out[4:6] = int(remaining_len).to_bytes(2, "little")
    out[6:8] = int(ndims).to_bytes(2, "little")
    return bytes(out)


def read_metadata_rle(buf: bytes) -> tuple[int, int, int]:
    """Returns (ngroups, remaining_len, ndims)."""
    ngroups = int.from_bytes(buf[0:4], "little")
    remaining_len = int.from_bytes(buf[4:6], "little")
    ndims = int.from_bytes(buf[6:8], "little")
    return ngroups, remaining_len, ndims


class RowMajorLayout:
    """Byte-aligned packed rows across dims."""

    run_cmp_allows_equal_for_xff = True

    @staticmethod
    def block_widths(errs_zz: np.ndarray, elem_sz: int) -> np.ndarray:
        ormask = np.bitwise_or.reduce(errs_zz.astype(np.uint32), axis=0)
        if elem_sz == 1:
            masks = NBITS_MASKS_U8[ormask].astype(np.uint32)
        else:
            upper = NBITS_MASKS_U8[ormask >> 8].astype(np.uint32)
            low_only = NBITS_MASKS_U8[np.where(upper > 0, 0, ormask)].astype(
                np.uint32)
            masks = np.where(upper > 0, (upper << 8) + 255, low_only)
        return np.array([int(m).bit_length() for m in masks], dtype=np.int64)

    @staticmethod
    def payload_nbytes(widths: np.ndarray, block_sz: int = BLOCK_SZ) -> int:
        row_nbytes = (int(widths.sum()) + 7) // 8
        return row_nbytes * block_sz

    @staticmethod
    def emit_payload(out: bytearray, errs_zz: np.ndarray, widths: np.ndarray):
        row_nbytes = (int(widths.sum()) + 7) // 8
        for r in range(errs_zz.shape[0]):
            out.extend(pack_row_bits(errs_zz[r], widths).to_bytes(
                row_nbytes, "little"))

    @staticmethod
    def parse_payload(buf: bytes, pos: int, widths: np.ndarray, udt,
                      block_sz: int = BLOCK_SZ) -> tuple[np.ndarray, int]:
        row_nbytes = (int(widths.sum()) + 7) // 8
        errs_zz = np.empty((block_sz, len(widths)), dtype=udt)
        for r in range(block_sz):
            row_int = int.from_bytes(buf[pos : pos + row_nbytes], "little")
            pos += row_nbytes
            errs_zz[r] = unpack_row_bits(row_int, widths, udt)
        return errs_zz, pos


class LowDimLayout:
    """Column-major packing: each dim's 8 samples occupy exactly w bytes."""

    run_cmp_allows_equal_for_xff = False

    @staticmethod
    def block_widths(errs_zz: np.ndarray, elem_sz: int) -> np.ndarray:
        ormask = np.bitwise_or.reduce(errs_zz.astype(np.uint32), axis=0)
        elem_bits = 8 * elem_sz
        widths = np.array([int(m).bit_length() for m in ormask], dtype=np.int64)
        return np.where(widths == elem_bits - 1, elem_bits, widths)

    @staticmethod
    def payload_nbytes(widths: np.ndarray, block_sz: int = BLOCK_SZ) -> int:
        # block_sz samples * w bits == w * block_sz/8 bytes per dim
        return int(widths.sum()) * block_sz // 8

    @staticmethod
    def emit_payload(out: bytearray, errs_zz: np.ndarray, widths: np.ndarray):
        block_sz = errs_zz.shape[0]
        for d, w in enumerate(widths.tolist()):
            if w == 0:
                continue
            acc = 0
            for r in range(block_sz):
                acc |= (int(errs_zz[r, d]) & ((1 << w) - 1)) << (r * w)
            out.extend(acc.to_bytes(w * block_sz // 8, "little"))

    @staticmethod
    def parse_payload(buf: bytes, pos: int, widths: np.ndarray, udt,
                      block_sz: int = BLOCK_SZ) -> tuple[np.ndarray, int]:
        errs_zz = np.zeros((block_sz, len(widths)), dtype=udt)
        for d, w in enumerate(widths.tolist()):
            if w == 0:
                continue
            nb = w * block_sz // 8
            acc = int.from_bytes(buf[pos : pos + nb], "little")
            pos += nb
            for r in range(block_sz):
                errs_zz[r, d] = (acc >> (r * w)) & ((1 << w) - 1)
        return errs_zz, pos


class IdentityPredictor:
    """Bitpack-only codec: values pass through unmodified (no zigzag)."""

    def __init__(self, ndims: int, elem_sz: int, block_sz: int = BLOCK_SZ):
        self.ndims = ndims
        self.udt = uint_dtype(elem_sz)
        self.block_sz = block_sz

    def encode_block(self, block: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(block, dtype=self.udt)

    def decode_block(self, errs: np.ndarray) -> np.ndarray:
        return errs.astype(self.udt)

    def decode_run(self, nblocks: int) -> np.ndarray:
        return np.zeros((nblocks * self.block_sz, self.ndims), dtype=self.udt)


def make_predictor(codec: str, ndims: int, elem_sz: int, lowdim: bool = False,
                   block_sz: int = BLOCK_SZ):
    if codec == "raw":
        return IdentityPredictor(ndims, elem_sz, block_sz=block_sz)
    if codec == "delta":
        return DeltaPredictor(ndims, elem_sz, block_sz=block_sz)
    if codec == "xff":
        # Lowdim FIRE uses full-precision coefficients; rowmajor truncates
        # to the top 4 bits (sprintz_xff_lowdim.cpp:38-39 vs
        # sprintz_xff_rle.cpp:209-221).
        assert block_sz == 8
        return FirePredictor(ndims, elem_sz, truncate_coeffs=not lowdim)
    raise ValueError(f"unknown codec {codec!r}")


def write_metadata_simple(length: int, ndims: int) -> bytes:
    """6-byte header {u32 len, u16 ndims} LE (format.h:64-72)."""
    return int(length).to_bytes(4, "little") + int(ndims).to_bytes(2, "little")


def read_metadata_simple(buf: bytes) -> tuple[int, int]:
    """Returns (len, ndims)."""
    return (int.from_bytes(buf[0:4], "little"),
            int.from_bytes(buf[4:6], "little"))


def compress_simple(
    src: np.ndarray,
    ndims: int,
    codec: str,
    layout=RowMajorLayout,
    write_size: bool = True,
) -> bytes:
    """Non-RLE codecs (sprintz_delta.cpp:64-381, :777-1010,
    sprintz_xff.cpp:34-300): every group emits its two blocks, zero-width
    or not; no run machinery. ``codec``: "raw" (bitpack only), "delta",
    or "xff". The legacy xff variant uses an 8-byte
    {u48 len, u16 ndims} header (sprintz_xff.cpp:64-69) instead of the
    6-byte simple one."""
    src = np.ascontiguousarray(src)
    elem_sz = src.dtype.itemsize
    n = src.size
    hdr_bits = nbits_sz_bits(elem_sz)
    elem_bits = 8 * elem_sz
    block_elems = BLOCK_SZ * ndims
    group_sz = block_elems * GROUP_SZ_BLOCKS
    total_header_bytes = (ndims * hdr_bits * GROUP_SZ_BLOCKS + 7) // 8

    out = bytearray()
    if write_size:
        if codec == "xff":
            out += int(n).to_bytes(6, "little")
            out += int(ndims).to_bytes(2, "little")
        else:
            out += write_metadata_simple(n, ndims)
    if n < MIN_DATA_SIZE:
        out += src.tobytes()
        return bytes(out)

    predictor = make_predictor(codec, ndims, elem_sz)
    ngroups = n // group_sz
    i = 0
    for _g in range(ngroups):
        header_pos = len(out)
        out.extend(bytes(total_header_bytes))
        header_acc = 0
        hdr_bitpos = 0
        for _b in range(GROUP_SZ_BLOCKS):
            block = src[i : i + block_elems].reshape(BLOCK_SZ, ndims)
            errs_zz = predictor.encode_block(block)
            widths = layout.block_widths(errs_zz, elem_sz)
            for w in widths.tolist():
                h = w - (1 if w == elem_bits else 0)
                header_acc |= h << hdr_bitpos
                hdr_bitpos += hdr_bits
            layout.emit_payload(out, errs_zz, widths)
            i += block_elems
        out[header_pos : header_pos + total_header_bytes] = (
            header_acc.to_bytes(total_header_bytes, "little"))
    out += src[i:].tobytes()
    return bytes(out)


def decompress_simple(
    buf: bytes,
    codec: str,
    layout=RowMajorLayout,
    elem_sz: int = 1,
) -> np.ndarray:
    """Inverse of compress_simple."""
    if codec == "xff":
        n = int.from_bytes(buf[0:6], "little")
        ndims = int.from_bytes(buf[6:8], "little")
        pos = 8
    else:
        n, ndims = read_metadata_simple(buf)
        pos = 6
    udt = uint_dtype(elem_sz)
    if n < MIN_DATA_SIZE:
        return np.frombuffer(buf, dtype=udt, count=n, offset=pos).copy()
    hdr_bits = nbits_sz_bits(elem_sz)
    elem_bits = 8 * elem_sz
    group_sz = BLOCK_SZ * ndims * GROUP_SZ_BLOCKS
    total_header_bytes = (ndims * hdr_bits * GROUP_SZ_BLOCKS + 7) // 8
    predictor = make_predictor(codec, ndims, elem_sz)
    ngroups = n // group_sz
    chunks = []
    for _g in range(ngroups):
        header_acc = int.from_bytes(buf[pos : pos + total_header_bytes],
                                    "little")
        pos += total_header_bytes
        hdr_bitpos = 0
        for _b in range(GROUP_SZ_BLOCKS):
            raw = [(header_acc >> (hdr_bitpos + d * hdr_bits))
                   & ((1 << hdr_bits) - 1) for d in range(ndims)]
            hdr_bitpos += ndims * hdr_bits
            widths = np.array(
                [elem_bits if h == elem_bits - 1 else h for h in raw],
                dtype=np.int64)
            errs_zz, pos = layout.parse_payload(buf, pos, widths, udt)
            chunks.append(predictor.decode_block(errs_zz))
    remaining = n - ngroups * group_sz
    tail = np.frombuffer(buf, dtype=udt, count=remaining, offset=pos)
    body = (np.concatenate(chunks).reshape(-1) if chunks
            else np.empty(0, dtype=udt))
    return np.concatenate([body.astype(udt, copy=False), tail])


def _check_cfg(cfg: CodecConfig, codec: str):
    assert cfg.block_sz % 8 == 0 and cfg.block_sz >= 8, (
        "block_sz must be a positive multiple of 8 (byte-aligned blocks)")
    assert cfg.group_sz_blocks >= 1
    assert 1 <= cfg.max_run_nblocks <= 0x7FFF, "run length is a 15-bit varint"
    if codec == "xff":
        assert cfg.block_sz == 8, (
            "FIRE's learning constants are tied to 8-sample blocks "
            "(sprintz_xff_rle.cpp:74-76)")


def compress_rle(
    src: np.ndarray,
    ndims: int,
    codec: str,
    layout,
    write_size: bool = True,
    cfg: CodecConfig = DEFAULT_CONFIG,
) -> bytes:
    """Shared group/RLE encoder over a block payload layout strategy.

    A non-default ``cfg`` yields self-consistent (but not
    reference-compatible) streams; decode with the same cfg."""
    _check_cfg(cfg, codec)
    src = np.ascontiguousarray(src)
    elem_sz = src.dtype.itemsize
    assert src.dtype in (np.uint8, np.uint16), src.dtype
    assert ndims >= 1
    n = src.size
    hdr_bits = nbits_sz_bits(elem_sz)
    elem_bits = 8 * elem_sz
    BLOCK_SZ = cfg.block_sz
    GROUP_SZ_BLOCKS = cfg.group_sz_blocks
    MAX_RUN_NBLOCKS = cfg.max_run_nblocks
    MIN_DATA_SIZE = cfg.min_data_size
    block_elems = BLOCK_SZ * ndims
    group_sz = block_elems * GROUP_SZ_BLOCKS
    total_header_bits = ndims * hdr_bits * GROUP_SZ_BLOCKS
    total_header_bytes = (total_header_bits + 7) // 8

    if n < MIN_DATA_SIZE:
        out = bytearray()
        if write_size:
            out += write_metadata_rle(0, n, ndims)
        out += src.tobytes()
        return bytes(out)

    predictor = make_predictor(codec, ndims, elem_sz,
                               lowdim=layout is LowDimLayout,
                               block_sz=BLOCK_SZ)
    run_cmp_allows_equal = codec == "xff" and layout.run_cmp_allows_equal_for_xff

    out = bytearray()
    if write_size:
        out += bytes(METADATA_LEN_RLE)  # patched at the end

    last_start = n - group_sz
    i = 0
    run = 0
    ngroups = 0
    finished = False

    header_pos = 0
    header_acc = 0
    hdr_bitpos = 0

    def start_group():
        nonlocal ngroups, header_pos, header_acc, hdr_bitpos
        ngroups += 1
        header_pos = len(out)
        out.extend(bytes(total_header_bytes))
        header_acc = 0
        hdr_bitpos = 0

    def flush_group_header():
        out[header_pos : header_pos + total_header_bytes] = header_acc.to_bytes(
            total_header_bytes, "little")

    def emit_block(errs_zz: np.ndarray, widths: np.ndarray):
        nonlocal header_acc, hdr_bitpos
        for w in widths.tolist():
            h = w - (1 if w == elem_bits else 0)
            header_acc |= h << hdr_bitpos
            hdr_bitpos += hdr_bits
        layout.emit_payload(out, errs_zz, widths)

    while i <= last_start and not finished:
        start_group()
        b = 0
        while b < GROUP_SZ_BLOCKS:
            block = src[i : i + block_elems].reshape(BLOCK_SZ, ndims)
            errs_zz = predictor.encode_block(block)
            widths = layout.block_widths(errs_zz, elem_sz)
            width_bits = int(widths.sum())

            while True:  # `just_read_block` re-entry point
                if width_bits == 0 and run < MAX_RUN_NBLOCKS:
                    run += 1
                    i += block_elems
                    more = (i <= last_start) if run_cmp_allows_equal else (
                        i < last_start)
                    if more:
                        break  # read next block, same group position
                    # end of data: close the run and pad out the group
                    hdr_bitpos += ndims * hdr_bits
                    b += 1
                    out.extend(encode_run_varint(run))
                    while b < GROUP_SZ_BLOCKS:
                        out.append(0)  # empty const sections
                        b += 1
                    run = 0
                    flush_group_header()
                    finished = True
                    break

                if run > 0:
                    b += 1
                    out.extend(encode_run_varint(run))
                    run = 0
                    hdr_bitpos += ndims * hdr_bits
                    if b == GROUP_SZ_BLOCKS:
                        # run closing filled the group: current block becomes
                        # the first block of a fresh group
                        flush_group_header()
                        start_group()
                        b = 0
                        continue  # re-enter with the same block
                    if width_bits == 0:
                        continue  # hit the run cap on a zero block

                emit_block(errs_zz, widths)
                i += block_elems
                b += 1
                break

            if finished:
                break
        else:
            flush_group_header()
            continue
        break  # only reached via `finished`

    remaining = n - i
    out += src[i:].tobytes()
    if write_size:
        out[0:METADATA_LEN_RLE] = write_metadata_rle(ngroups, remaining, ndims)
    return bytes(out)


def decompress_rle(
    buf: bytes,
    codec: str,
    layout,
    elem_sz: int = 1,
    ndims: int | None = None,
    ngroups: int | None = None,
    remaining_len: int | None = None,
    cfg: CodecConfig = DEFAULT_CONFIG,
) -> np.ndarray:
    """Shared group/RLE decoder over a block payload layout strategy."""
    _check_cfg(cfg, codec)
    BLOCK_SZ = cfg.block_sz
    GROUP_SZ_BLOCKS = cfg.group_sz_blocks
    MIN_DATA_SIZE = cfg.min_data_size
    pos = 0
    if ndims is None:
        ngroups, remaining_len, ndims = read_metadata_rle(buf)
        pos = METADATA_LEN_RLE
    assert ngroups is not None and remaining_len is not None

    udt = uint_dtype(elem_sz)
    hdr_bits = nbits_sz_bits(elem_sz)
    elem_bits = 8 * elem_sz
    total_header_bits = ndims * hdr_bits * GROUP_SZ_BLOCKS
    total_header_bytes = (total_header_bits + 7) // 8

    if ngroups == 0 and remaining_len < MIN_DATA_SIZE:
        return np.frombuffer(buf, dtype=udt, count=remaining_len, offset=pos).copy()

    predictor = make_predictor(codec, ndims, elem_sz,
                               lowdim=layout is LowDimLayout,
                               block_sz=BLOCK_SZ)
    chunks: list[np.ndarray] = []

    for _ in range(ngroups):
        header_acc = int.from_bytes(buf[pos : pos + total_header_bytes], "little")
        pos += total_header_bytes
        hdr_bitpos = 0
        for _b in range(GROUP_SZ_BLOCKS):
            raw = [
                (header_acc >> (hdr_bitpos + d * hdr_bits)) & ((1 << hdr_bits) - 1)
                for d in range(ndims)
            ]
            hdr_bitpos += ndims * hdr_bits
            widths = np.array(
                [elem_bits if h == elem_bits - 1 else h for h in raw],
                dtype=np.int64)
            if int(widths.sum()) == 0:
                length, pos = decode_run_varint(buf, pos)
                if length:
                    chunks.append(predictor.decode_run(length))
                continue
            errs_zz, pos = layout.parse_payload(buf, pos, widths, udt,
                                                block_sz=BLOCK_SZ)
            chunks.append(predictor.decode_block(errs_zz))

    trailing = np.frombuffer(buf, dtype=udt, count=remaining_len, offset=pos)
    body = np.concatenate(chunks).reshape(-1) if chunks else np.empty(0, dtype=udt)
    return np.concatenate([body.astype(udt, copy=False), trailing])
