"""Pallas kernels == XLA kernels (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sprintz_tpu.ops.pack import pack_rows_rowmajor, unpack_rows_rowmajor
from sprintz_tpu.ops.pallas_pack import pack_rows_pallas, unpack_rows_pallas


def _legal_widths(rng, nb, D, elem_sz):
    eb = 8 * elem_sz
    w = rng.integers(0, eb + 1, (nb, D))
    w[w == eb - 1] = eb  # eb-1 is illegal in the rowmajor format
    return w


@pytest.mark.parametrize("nb,D,elem_sz", [
    (64, 8, 1), (128, 17, 1), (64, 5, 2), (32, 64, 1), (16, 1, 1)])
def test_pallas_matches_xla(rng, nb, D, elem_sz):
    widths_np = _legal_widths(rng, nb, D, elem_sz)
    errs_np = np.zeros((nb, 8, D), dtype=np.int64)
    for b in range(nb):
        for d in range(D):
            w = widths_np[b, d]
            if w:
                errs_np[b, :, d] = rng.integers(0, 1 << w, 8)
    errs = jnp.asarray(errs_np, jnp.int32)
    widths = jnp.asarray(widths_np, jnp.int32)

    a = np.asarray(pack_rows_rowmajor(errs, widths, elem_sz))
    b = np.asarray(pack_rows_pallas(errs, widths, elem_sz))
    np.testing.assert_array_equal(a, b)

    dense = jnp.asarray(a, jnp.int32)
    ua = np.asarray(unpack_rows_rowmajor(dense, widths))
    ub = np.asarray(unpack_rows_pallas(dense, widths))
    np.testing.assert_array_equal(ua, ub)
    np.testing.assert_array_equal(ua, errs_np)

    from sprintz_tpu.ops.pallas_pack import unpack_rows_pallas_mxu

    for tb in (8, 16):
        um = np.asarray(unpack_rows_pallas_mxu(dense, widths, tb=tb))
        np.testing.assert_array_equal(ua, um, err_msg=f"mxu tb={tb}")
