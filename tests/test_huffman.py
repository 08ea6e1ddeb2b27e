"""Entropy stage: canonical Huffman tables, round trips, +Huf API."""

import numpy as np
import pytest

import sprintz_tpu
from sprintz_tpu.entropy import build_table, huff_compress, huff_decompress

from conftest import make_stream


@pytest.mark.parametrize("kind", ["rand", "small", "zeros", "sparse"])
def test_huffman_roundtrip(rng, kind):
    data = make_stream(rng, 60000, 1, kind)
    comp = huff_compress(data)
    for backend in ("auto", "numpy", "jax"):
        np.testing.assert_array_equal(
            huff_decompress(comp, backend=backend), data, err_msg=backend)


def test_huffman_native_matches_numpy(rng):
    """The C++ emitter must produce byte-identical streams to the numpy
    emitter, and both decoders must agree."""
    import sprintz_tpu.entropy.huffman as hf
    from sprintz_tpu import native_host

    if native_host.get_lib() is None:
        pytest.skip("native host lib unavailable")
    for kind in ("rand", "small", "sparse"):
        data = make_stream(rng, 50_001, 1, kind)
        t = hf.build_table(data)
        native = native_host.huff_encode_native(
            data, hf.DEFAULT_CHUNK_SYMBOLS, t.codes, t.lengths)
        assert native is not None
        comp_native = huff_compress(data)
        # numpy emitter (force by bypassing native)
        import unittest.mock as mock

        with mock.patch.object(
                native_host, "huff_encode_native", lambda *a: None):
            comp_np = huff_compress(data)
        assert comp_native == comp_np, kind


def test_huffman_edge_cases():
    for data in [np.zeros(0, np.uint8), np.array([3], np.uint8),
                 np.arange(256, dtype=np.uint8)]:
        comp = huff_compress(data)
        np.testing.assert_array_equal(huff_decompress(comp), data)


def test_table_kraft(rng):
    # adversarial skew must still satisfy Kraft with max length 12
    counts_data = np.repeat(np.arange(200, dtype=np.uint8),
                            (np.arange(200) ** 3 // 1000 + 1))
    t = build_table(counts_data)
    used = t.lengths[t.lengths > 0].astype(int)
    assert used.max() <= 12
    assert np.sum(2.0 ** -used) <= 1.0 + 1e-12


def test_plus_huf_api(rng):
    x = (np.cumsum(rng.integers(-5, 6, (3000, 5)), axis=0) % 256
         ).astype(np.uint8)
    plain = sprintz_tpu.SprintzCodec("delta", 1)
    huf = sprintz_tpu.SprintzCodec("delta", 1, entropy="huffman")
    b0, b1 = plain.compress(x), huf.compress(x)
    np.testing.assert_array_equal(huf.decompress(b1), x.reshape(-1))
    assert len(b1) < len(b0)  # entropy stage helps on smooth data
