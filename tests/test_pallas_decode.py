"""Fused Pallas decode pipeline: exactness in interpret mode (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sprintz_tpu.models.forecasters import delta_encode
from sprintz_tpu.ops.bitmath import block_widths_rowmajor
from sprintz_tpu.ops.pack import pack_rows_rowmajor
from sprintz_tpu.ops.pallas_decode import (
    decode_delta_contiguous, prefix_finish, unpack_zz)


def _mk(rng, eb, D, nb, kind="rand"):
    hi = 1 << eb
    if kind == "rand":
        vals = rng.integers(0, hi, (nb * 8, D)).astype(np.int64)
    else:
        vals = (np.cumsum(rng.integers(-5, 6, (nb * 8, D)), axis=0) % hi
                ).astype(np.int64)
    rows = jnp.asarray(vals, jnp.int32)
    errs = delta_encode(rows, eb).reshape(nb, 8, D)
    widths = block_widths_rowmajor(jnp.bitwise_or.reduce(errs, axis=1),
                                   eb // 8)
    dense = pack_rows_rowmajor(errs, widths, eb // 8).astype(jnp.uint8)
    return vals, errs, widths, dense


@pytest.mark.parametrize("eb,D,nb", [(8, 64, 128), (16, 7, 64),
                                     (8, 3, 32), (16, 33, 96)])
def test_fused_pipeline_exact(rng, eb, D, nb):
    vals, _, widths, dense = _mk(rng, eb, D, nb)
    got = np.asarray(decode_delta_contiguous(dense, widths, eb))
    np.testing.assert_array_equal(got.astype(np.int64), vals)


def test_unpack_zz_and_totals(rng):
    eb, D, nb = 8, 16, 64
    vals, errs, widths, dense = _mk(rng, eb, D, nb, kind="smooth")
    bz, tots = unpack_zz(dense, widths, eb, tile=16)
    want = np.asarray(((errs >> 1) ^ -(errs & 1)) + 128).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(bz), want)
    deltas = want.astype(np.int64).reshape(-1, D) - 128
    want_tots = deltas.reshape(nb // 16, 16 * 8, D).sum(axis=1)
    np.testing.assert_array_equal(
        np.asarray(tots).reshape(-1, D), want_tots)


def test_prefix_finish_u16(rng):
    rows, D = 1024, 5
    deltas = rng.integers(-32768, 32768, (rows, D)).astype(np.int64)
    bz = jnp.asarray(deltas + 32768, jnp.uint16)
    tile = 256
    tots = deltas.reshape(rows // tile, tile, D).sum(axis=1)
    toff = (np.cumsum(tots, axis=0) - tots).astype(np.int32)
    got = np.asarray(prefix_finish(
        bz, jnp.asarray(toff[:, None, :]), 16, tile))
    want = (np.cumsum(deltas, axis=0) % 65536).astype(np.uint16)
    np.testing.assert_array_equal(got, want)
