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


# ---------------------------------------------------------------- oracle
# Direct A/B vs the reference query engine
# (sprintz_delta_rle_query.cpp:149-192, sprintz_xff_rle_query.cpp;
# VERDICT r3 item 4 / missing item 2). The public entry points expose
# the return count and the materialized output; the reduction state is
# extracted by the tests/oracle.py shim. The reference reducers'
# *observed* semantics, verified bit-for-bit below:
# - SumQuery accumulates the stream's BYTES sign-extended as int8 into
#   i32 lanes for BOTH element widths (overload resolution: the i32
#   accumulator packets only match the int8_t `accumulate`,
#   query.hpp:77-112), and its `_mm_slli_si128` byte-extraction bug
#   zeroes lanes 8-15/24-31 of every 32-byte stripe. Wraparound is
#   mod 2^32 with runs contributing value*ncopies (the nrepeats trick,
#   sprintz_delta_rle_query.hpp:287).
# - MaxQuery is a correct per-dim unsigned max for ndims <= one vector
#   (32 u8 / 16 u16 dims); beyond that its `state[0] =
#   max(state[vstripe], vals)` (query.hpp:233) collapses stripes.
# - Tail (remaining_len) elements are copied, never reduced — and
#   the RLE encoder always leaves a final verbatim-tail block.
# Our pushdown intentionally implements the true unsigned per-dim
# reductions (docs/PARITY.md row 12); these tests pin the reference's
# behavior and prove the materialize/count surfaces identical.
import itertools

import oracle

oracle_only = pytest.mark.skipif(
    not (oracle.available() and oracle.ensure_query_shim()),
    reason="reference oracle library/shim not built")


def _runs_stream(rng, nrows, ndims, elem_sz):
    hi = 1 << (8 * elem_sz)
    dt = np.uint8 if elem_sz == 1 else np.uint16
    seg = rng.integers(-6, 7, (nrows, ndims))
    m = (np.arange(nrows) // 64 % 3 == 0)[:, None]
    return (np.cumsum(np.where(m, 0, seg), axis=0) % hi).astype(dt)


def _ref_sum_state_model(x, nlanes):
    """The reference SumQuery state as observed (see block comment)."""
    rows, D = x.shape
    es = x.dtype.itemsize
    row_bytes = np.frombuffer(x.tobytes(), np.uint8).reshape(rows, D * es)
    sums = row_bytes.view(np.int8).astype(np.int64).sum(axis=0)
    state = np.zeros(nlanes, np.int64)
    vec_elems = 32 // es
    nstripes = -(-max(D, 1) // vec_elems)
    for v in range(nstripes):
        base = (32 // es) * v
        for j in range(8):
            for col_off in (j, 16 + j):
                col = 32 * v + col_off
                lane = base + col_off
                if col < D * es and lane < nlanes:
                    state[lane] += sums[col]
    return (state % (1 << 32)).astype(np.uint32).view(np.int32)


@oracle_only
@pytest.mark.parametrize("codec,elem_sz", itertools.product(
    ["delta", "xff"], [1, 2]))
def test_query_oracle_materialize(rng, codec, elem_sz):
    """ret + materialized dest match the reference for RLE-heavy and
    random grids, max/sum x materialize T/F, including tails."""
    # ndims above the lowdim boundary for both widths: the
    # reference query engine is rowmajor-only
    for ndims, nrows in [(5, 512), (9, 512), (40, 256)]:
        for make in (_runs_stream,
                     lambda r, n, d, e: make_stream(
                         r, n * d, e, "rand").reshape(n, d)):
            x = make(rng, nrows, ndims, elem_sz)
            x = x[: nrows - 3]  # force a remaining_len tail
            buf = encoder.compress(x.reshape(-1), ndims, codec=codec)
            for op in (1, 2):  # REDUCE_MAX, REDUCE_SUM
                ret, dest = oracle.ref_query(
                    codec, elem_sz, buf, op, True, x.size)
                assert ret == x.size
                if (codec, elem_sz) == ("xff", 2):
                    # documented REFERENCE bug: query_rowmajor_xff_rle_16b
                    # mis-decodes streams its own regular decompressor
                    # round-trips (verified: decompress_rowmajor_xff_rle_16b
                    # reproduces x exactly while the query dest diverges).
                    # Pin the divergence so a future ref rebuild that fixes
                    # it re-enables the strict check here.
                    np.testing.assert_array_equal(
                        oracle.ref_decompress(
                            "decompress_xff_rle_16b", buf, x.size),
                        x.reshape(-1))
                    assert not np.array_equal(dest, x.reshape(-1))
                else:
                    np.testing.assert_array_equal(
                        dest, x.reshape(-1),
                        err_msg=f"{codec} u{8*elem_sz} d{ndims} op{op}")
                ret2, dest2 = oracle.ref_query(
                    codec, elem_sz, buf, op, False, x.size)
                assert ret2 == x.size and not dest2.any()
                # ours agrees on the materialized surface + true reduce
                r = query(buf, QueryParams(
                    Operation(op), materialize=True), codec, elem_sz)
                np.testing.assert_array_equal(r.data, x)
                if op == 1:
                    np.testing.assert_array_equal(r.max, x.max(axis=0))
                else:
                    np.testing.assert_array_equal(
                        r.sum, x.sum(axis=0, dtype=np.int64))


@oracle_only
@pytest.mark.parametrize("codec,elem_sz", itertools.product(
    ["delta", "xff"], [1, 2]))
def test_query_oracle_sum_state(rng, codec, elem_sz):
    """The shim-extracted SumQuery accumulators match the byte-sum model
    bit-for-bit (i32 wraparound + nrepeats runs + dropped lanes)."""
    if (codec, elem_sz) == ("xff", 2):
        pytest.skip("reference query_rowmajor_xff_rle_16b mis-decodes "
                    "(documented ref bug, test_query_oracle_materialize)")
    for ndims, nrows in [(5, 512), (12, 512), (24, 256), (40, 256)]:
        x = _runs_stream(rng, nrows, ndims, elem_sz)  # multiple of 16 rows
        buf = encoder.compress(x.reshape(-1), ndims, codec=codec)
        ret, dest, state = oracle.ref_query_state(
            codec, elem_sz, buf, 2, False, x.size, ndims)
        assert ret == x.size
        # the RLE group structure leaves a verbatim tail the query engine
        # copies without reducing (remaining_len rows)
        from sprintz_tpu.golden.stream import read_metadata_rle
        _, rem, _ = read_metadata_rle(buf)
        model = _ref_sum_state_model(x[: len(x) - rem // ndims], state.size)
        lanes = min(state.size, (32 // elem_sz) * (-(-ndims * elem_sz // 32)))
        np.testing.assert_array_equal(
            state[:lanes], model[:lanes],
            err_msg=f"{codec} u{8*elem_sz} d{ndims}")


@oracle_only
@pytest.mark.parametrize("codec,elem_sz", itertools.product(
    ["delta", "xff"], [1, 2]))
def test_query_oracle_max_state(rng, codec, elem_sz):
    """For ndims within one vector the reference MaxQuery state is the
    true per-dim unsigned max — A/B'd against our REDUCE_MAX."""
    if (codec, elem_sz) == ("xff", 2):
        pytest.skip("reference query_rowmajor_xff_rle_16b mis-decodes "
                    "(documented ref bug, test_query_oracle_materialize)")
    vec = 32 // elem_sz
    for ndims in [5, vec // 2, vec]:
        x = _runs_stream(rng, 512, ndims, elem_sz)
        buf = encoder.compress(x.reshape(-1), ndims, codec=codec)
        ret, dest, state = oracle.ref_query_state(
            codec, elem_sz, buf, 1, False, x.size, ndims)
        dt = np.uint8 if elem_sz == 1 else np.uint16
        ref_max = state.view(dt)[:ndims]
        ours = query(buf, QueryParams(Operation.REDUCE_MAX, False),
                     codec, elem_sz)
        # the reference never reduces the verbatim tail rows; ours does
        from sprintz_tpu.golden.stream import read_metadata_rle
        _, rem, _ = read_metadata_rle(buf)
        np.testing.assert_array_equal(
            ref_max, x[: len(x) - rem // ndims].max(axis=0))
        np.testing.assert_array_equal(ours.max, x.max(axis=0))
