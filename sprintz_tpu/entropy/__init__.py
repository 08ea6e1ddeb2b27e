"""Entropy coding stage (the paper's "+Huf" variants).

The reference repo's entropy.cpp is a stub with empty tables; published
results used the external Huff0 coder (communicate/method.tex:300-303,
SURVEY §2.9). This package implements the capability natively:
canonical length-limited Huffman, chunked for parallel device decode.
"""

from .huffman import (  # noqa: F401
    HuffmanTable,
    build_table,
    huff_compress,
    huff_compress_device,
    huff_decompress,
)
