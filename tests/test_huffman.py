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
    np.testing.assert_array_equal(huff_decompress(comp, use_jax=False), data)
    np.testing.assert_array_equal(huff_decompress(comp, use_jax=True), data)


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
