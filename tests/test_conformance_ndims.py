"""ndims conformance sweep (the reference's test_codec_many_ndims analogue,
test/compress_testing.hpp:482-496, reduced for CI time)."""

import numpy as np
import pytest

from sprintz_tpu import decoder, encoder

from conftest import make_stream

NDIMS_SWEEP = list(range(1, 18)) + [31, 32, 33, 63, 64, 65, 127, 128, 129]


@pytest.mark.parametrize("codec", ["delta", "xff"])
def test_ndims_sweep_roundtrip(rng, codec):
    for ndims in NDIMS_SWEEP:
        x = make_stream(rng, 160 * ndims, 1, "sparse")
        buf = encoder.compress(x, ndims, codec=codec)
        dec = decoder.decompress(buf, codec=codec, elem_sz=1)
        np.testing.assert_array_equal(dec, x, err_msg=f"ndims={ndims}")


def test_ndims_sweep_byte_exact(rng):
    import oracle

    if not oracle.available():
        pytest.skip("oracle not built")
    for codec in ("delta", "xff"):
        for ndims in [5, 33, 65, 129]:
            x = make_stream(rng, 200 * ndims, 1, "sparse")
            mine = encoder.compress(x, ndims, codec=codec)
            ref = oracle.ref_compress(f"compress_{codec}_rle_8b", x, ndims)
            oracle.assert_stream_matches(mine, ref, f"{codec} d={ndims}")
