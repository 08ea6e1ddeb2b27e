"""Golden low-dimensional (column-major) Sprintz codecs.

Used for ndims <= 4 (u8) / <= 2 (u16), where a sample row fits in 32 bits
(sprintz_delta_lowdim.cpp:64-70). Packing each dim's 8 samples contiguously
means every dim lands on a byte boundary (8*w bits == w bytes), which is
also why the univariate path has no per-row padding overhead
(communicate/method.tex:293-295).

Reference parity: sprintz_delta_lowdim.cpp:38-829, sprintz_xff_lowdim.cpp.
"""

from __future__ import annotations

import numpy as np

from ..constants import LOWDIM_MAX_NDIMS
from .stream import LowDimLayout, compress_rle, decompress_rle

__all__ = ["compress_lowdim_rle", "decompress_lowdim_rle"]


def _check_ndims(ndims: int, elem_sz: int):
    if not (1 <= ndims <= LOWDIM_MAX_NDIMS[elem_sz]):
        raise ValueError(
            f"lowdim codec supports 1..{LOWDIM_MAX_NDIMS[elem_sz]} dims for "
            f"elem_sz={elem_sz}, got {ndims}")


def compress_lowdim_rle(
    src: np.ndarray, ndims: int, codec: str = "delta", write_size: bool = True
) -> bytes:
    _check_ndims(ndims, src.dtype.itemsize)
    return compress_rle(src, ndims, codec, LowDimLayout, write_size=write_size)


def decompress_lowdim_rle(
    buf: bytes,
    codec: str = "delta",
    elem_sz: int = 1,
    ndims: int | None = None,
    ngroups: int | None = None,
    remaining_len: int | None = None,
) -> np.ndarray:
    return decompress_rle(
        buf, codec, LowDimLayout, elem_sz=elem_sz, ndims=ndims,
        ngroups=ngroups, remaining_len=remaining_len)
