"""Query pushdown: reductions over compressed streams vs numpy oracle."""

import numpy as np
import pytest

from sprintz_tpu import encoder
from sprintz_tpu.query import Operation, QueryParams, query

from conftest import make_stream


@pytest.mark.parametrize("codec", ["delta", "xff"])
@pytest.mark.parametrize("elem_sz", [1, 2])
def test_query_reductions(rng, codec, elem_sz):
    for ndims in [1, 9]:
        x = make_stream(rng, 700 * ndims, elem_sz, "sparse")
        rows = x.reshape(-1, ndims)
        buf = encoder.compress(x, ndims, codec=codec)
        r = query(buf, QueryParams(Operation.REDUCE_MAX, materialize=True),
                  codec, elem_sz)
        np.testing.assert_array_equal(r.data.reshape(-1), x)
        np.testing.assert_array_equal(r.max, rows.max(axis=0))
        r2 = query(buf, QueryParams(Operation.REDUCE_SUM, materialize=False),
                   codec, elem_sz)
        assert r2.data is None
        np.testing.assert_array_equal(r2.sum, rows.sum(axis=0, dtype=np.int64))
        r3 = query(buf, QueryParams(Operation.REDUCE_MIN, materialize=False),
                   codec, elem_sz)
        np.testing.assert_array_equal(r3.min, rows.min(axis=0))


def test_query_small_stream(rng):
    x = make_stream(rng, 40, 1, "rand")  # below MIN_DATA_SIZE: verbatim
    buf = encoder.compress(x, 1, codec="delta")
    r = query(buf, QueryParams(Operation.REDUCE_MAX), "delta", 1)
    assert r.max[0] == x.max()


def test_query_rle_runs(rng):
    # long zero runs: reductions must account for run-materialized rows
    x = np.zeros(4000, dtype=np.uint8)
    x[1000:1008] = 200
    buf = encoder.compress(x, 1, codec="delta")
    r = query(buf, QueryParams(Operation.REDUCE_SUM, materialize=False),
              "delta", 1)
    assert r.sum[0] == int(x.sum())
