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


@pytest.mark.parametrize("elem_sz", [1, 2])
def test_query_compact_o1_runs(rng, elem_sz):
    """Delta + materialize=False takes the O(data-blocks) compact path
    (the reference's nrepeats trick, query.hpp:95-135): 99%-RLE streams
    with nonzero run values, leading runs, and trailing runs."""
    from sprintz_tpu.query import pushdown

    dt = np.uint8 if elem_sz == 1 else np.uint16
    for ndims in [1, 9]:
        # piecewise-constant: long nonzero plateaus -> RLE runs whose
        # value is NOT zero (exercises the v_before closed form);
        # starts with a zero plateau (leading run)
        n = 20_000
        rows = np.zeros((n, ndims), dtype=dt)
        lvl = rng.integers(1, 200, ndims)
        rows[5_000:12_000] = lvl
        rows[15_000:] = (lvl * 3) % (1 << (8 * elem_sz))
        x = rows.reshape(-1)
        buf = encoder.compress(x, ndims, codec="delta")
        for op, field in [(Operation.REDUCE_SUM, "sum"),
                          (Operation.REDUCE_MAX, "max"),
                          (Operation.REDUCE_MIN, "min")]:
            r = query(buf, QueryParams(op, materialize=False),
                      "delta", elem_sz)
            assert pushdown.last_path == "compact"
            want = getattr(rows.astype(np.int64), field.replace("sum", "sum")
                           )(axis=0)
            np.testing.assert_array_equal(getattr(r, field), want,
                                          err_msg=f"{op} d{ndims}")
            # the fused (materializing) path must agree bit-for-bit
            r2 = query(buf, QueryParams(op, materialize=True),
                       "delta", elem_sz)
            assert pushdown.last_path == "fused"
            np.testing.assert_array_equal(getattr(r2, field),
                                          getattr(r, field))


def test_query_compact_all_runs(rng):
    # a stream that is nothing but runs (all zeros)
    from sprintz_tpu.query import pushdown

    x = np.zeros(50_000, dtype=np.uint8)
    buf = encoder.compress(x, 1, codec="delta")
    r = query(buf, QueryParams(Operation.REDUCE_SUM, materialize=False),
              "delta", 1)
    assert pushdown.last_path == "compact"
    assert r.sum[0] == 0
    r = query(buf, QueryParams(Operation.REDUCE_MIN, materialize=False),
              "delta", 1)
    assert r.min[0] == 0
