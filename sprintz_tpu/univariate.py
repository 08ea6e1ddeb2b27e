"""Univariate codec façade.

The reference carries nine historical univariate 8-bit codecs
(univariate_8b.cpp — delta_simple, delta, online, delta_online,
delta2_online, delta_rle, delta_rle2, doubledelta, dyndelta), precursors
of the multivariate design; SURVEY §2.11 notes the new framework needs
the *capability* (a univariate path), not all nine. This module exposes
that capability through the framework's production codecs:

- "sprintz"    : the full lowdim ndims=1 Sprintz path (delta or FIRE +
                 RLE) — strictly dominates the legacy delta_rle variants
- "delta"/"doubledelta"/"tripledelta": whole-buffer nth-order transforms
- "dyndelta"   : per-block delta vs double-delta choice (u16)
- all NINE reference legacy byte formats, byte-exact
                 (golden/univariate8b.py): "delta_simple8b", "delta8b",
                 "online8b", "delta_online8b", "delta2_online8b",
                 "delta_rle8b", "delta_rle28b", "doubledelta8b",
                 "dyndelta8b"
- "sprintzpack": per-block bitpack without prediction (u16)
"""

from __future__ import annotations

import numpy as np

from . import api
from .models import online


def compress_univariate(x: np.ndarray, method: str = "sprintz",
                        codec: str = "delta") -> bytes:
    x = np.ascontiguousarray(x)
    if method == "sprintz":
        return api.SprintzCodec(codec, x.dtype.itemsize).compress(x)
    if method == "dyndelta":
        return online.dynamic_delta_pack_u16(x.astype(np.uint16))
    if method.endswith("8b"):
        from .golden import univariate8b as u8b

        enc = {"delta8b": u8b.compress_delta_8b,
               "delta_simple8b": u8b.compress_delta_simple_8b,
               "online8b": u8b.compress_online_8b,
               "delta_online8b": u8b.compress_delta_online_8b,
               "delta2_online8b": u8b.compress_delta2_online_8b,
               "delta_rle8b": u8b.compress_delta_rle_8b,
               "delta_rle28b": u8b.compress_delta_rle2_8b,
               "doubledelta8b": u8b.compress_doubledelta_8b,
               "dyndelta8b": u8b.compress_dyndelta_8b}[method]
        return enc(x.astype(np.uint8))
    if method == "sprintzpack":
        return online.sprintzpack_pack_u16(x.astype(np.uint16), zigzag=True)
    if method in ("delta", "doubledelta", "tripledelta"):
        order = {"delta": 1, "doubledelta": 2, "tripledelta": 3}[method]
        errs = online.nth_order_delta_encode(x.astype(np.uint16), order)
        return (bytes([order]) + int(x.size).to_bytes(4, "little")
                + errs.tobytes())
    raise ValueError(f"unknown univariate method {method!r}")


def decompress_univariate(buf: bytes, method: str = "sprintz",
                          codec: str = "delta", elem_sz: int = 1
                          ) -> np.ndarray:
    if method == "sprintz":
        return api.SprintzCodec(codec, elem_sz).decompress(buf)
    if method == "dyndelta":
        return online.dynamic_delta_unpack_u16(buf)
    if method.endswith("8b"):
        from .golden import univariate8b as u8b

        dec = {"delta8b": u8b.decompress_delta_8b,
               "delta_simple8b": u8b.decompress_delta_simple_8b,
               "online8b": u8b.decompress_online_8b,
               "delta_online8b": u8b.decompress_delta_online_8b,
               "delta2_online8b": u8b.decompress_delta2_online_8b,
               "delta_rle8b": u8b.decompress_delta_rle_8b,
               "delta_rle28b": u8b.decompress_delta_rle2_8b,
               "doubledelta8b": u8b.decompress_doubledelta_8b,
               "dyndelta8b": u8b.decompress_dyndelta_8b}[method]
        return dec(buf)
    if method == "sprintzpack":
        return online.sprintzpack_unpack_u16(buf, zigzag=True)
    if method in ("delta", "doubledelta", "tripledelta"):
        order = buf[0]
        n = int.from_bytes(buf[1:5], "little")
        errs = np.frombuffer(buf, dtype=np.int16, count=n, offset=5)
        return online.nth_order_delta_decode(errs, order)
    raise ValueError(f"unknown univariate method {method!r}")
