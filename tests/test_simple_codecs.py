"""Non-RLE codec variants: bitpack-only, delta, legacy 8b xff."""

import numpy as np
import pytest

from sprintz_tpu.golden.stream import compress_simple, decompress_simple

from conftest import KINDS, make_stream


@pytest.mark.parametrize("codec,elem_sz", [
    ("raw", 1), ("raw", 2), ("delta", 1), ("delta", 2), ("xff", 1)])
def test_simple_roundtrip(rng, codec, elem_sz):
    for ndims in [1, 5, 16]:
        for sz in [1, 127, 128, 129, 600]:
            for kind in KINDS:
                x = make_stream(rng, sz * ndims, elem_sz, kind)
                buf = compress_simple(x, ndims, codec)
                dec = decompress_simple(buf, codec, elem_sz=elem_sz)
                np.testing.assert_array_equal(dec, x)


def test_raw_bitpack_smaller_on_small_values(rng):
    x = rng.integers(0, 8, 10000).astype(np.uint8)  # 3-bit values
    buf = compress_simple(x, 8, "raw")
    assert len(buf) < 6000  # ~3-4 bits/elem incl. headers
