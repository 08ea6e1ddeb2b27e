"""Golden row-major Sprintz codecs (general ndims).

Reference parity: sprintz_delta_rle.cpp:54-415 / sprintz_xff_rle.cpp:60-560
(encode), :417-800 / :560-1206 (decode). See ``stream.py`` for the shared
group/RLE machinery and payload layout.
"""

from __future__ import annotations

import numpy as np

from ..constants import MIN_DATA_SIZE  # noqa: F401  (re-export for api.py)
from .stream import (
    RowMajorLayout,
    compress_rle,
    decompress_rle,
    read_metadata_rle,
    write_metadata_rle,
)

__all__ = [
    "compress_rowmajor_rle",
    "decompress_rowmajor_rle",
    "read_metadata_rle",
    "write_metadata_rle",
    "MIN_DATA_SIZE",
]


def compress_rowmajor_rle(
    src: np.ndarray, ndims: int, codec: str = "delta", write_size: bool = True
) -> bytes:
    return compress_rle(src, ndims, codec, RowMajorLayout, write_size=write_size)


def decompress_rowmajor_rle(
    buf: bytes,
    codec: str = "delta",
    elem_sz: int = 1,
    ndims: int | None = None,
    ngroups: int | None = None,
    remaining_len: int | None = None,
) -> np.ndarray:
    return decompress_rle(
        buf, codec, RowMajorLayout, elem_sz=elem_sz, ndims=ndims,
        ngroups=ngroups, remaining_len=remaining_len)
