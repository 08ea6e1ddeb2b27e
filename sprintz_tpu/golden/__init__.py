"""Bit-exact scalar reference ("golden") codecs — the executable format spec."""

from .rowmajor import (  # noqa: F401
    compress_rowmajor_rle,
    decompress_rowmajor_rle,
    read_metadata_rle,
    write_metadata_rle,
)
