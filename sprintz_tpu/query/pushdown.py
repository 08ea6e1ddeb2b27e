"""Query pushdown: run max/sum reductions over a compressed stream.

API parity with the reference's ``QueryParams{op, materialize}``
(query.hpp:22-29) and ``query_rowmajor_{delta,xff}_rle_{8,16}b``
(sprintz_delta_rle_query.cpp:149-192).

TPU-native design: instead of cloning the decoder with a functor inlined
into its scalar loop (sprintz_delta_rle_query.hpp:33-430), the reduction
is fused *by XLA* into the jitted decode pass — the reduce consumes the
reconstructed rows before they would be written to HBM, and with
``materialize=False`` the full output array is never transferred to the
host. The reference's O(1)-per-run ``nrepeats`` trick (query.hpp:95-135)
corresponds here to run rows being zero-error rows of the same device
pass: for delta they cost one lane-add each inside the same fused loop.
"""

from __future__ import annotations

import dataclasses
import enum
import functools

import numpy as np

from ..constants import LOWDIM_MAX_NDIMS, METADATA_LEN_RLE, MIN_DATA_SIZE
from ..golden.stream import read_metadata_rle


class Operation(enum.Enum):
    NOOP = 0
    REDUCE_MAX = 1
    REDUCE_SUM = 2
    REDUCE_MIN = 3  # extension: not in the reference enum


@dataclasses.dataclass(frozen=True)
class QueryParams:
    op: Operation = Operation.NOOP
    materialize: bool = True


@dataclasses.dataclass
class QueryResult:
    data: np.ndarray | None  # (rows, D) when materialized
    max: np.ndarray | None = None  # (D,)
    sum: np.ndarray | None = None  # (D,) int64
    min: np.ndarray | None = None  # (D,)


def _reduce_pass(vals, op: Operation):
    import jax.numpy as jnp

    if op == Operation.REDUCE_MAX:
        return jnp.max(vals, axis=0)
    if op == Operation.REDUCE_MIN:
        return jnp.min(vals, axis=0)
    if op == Operation.REDUCE_SUM:
        # i32 device accumulators, matching the reference's widening
        # (query.hpp:283-291); widened to i64 host-side
        return jnp.sum(vals, axis=0, dtype=jnp.int32)
    return None


def query(
    buf: bytes,
    params: QueryParams,
    codec: str = "delta",
    elem_sz: int = 1,
) -> QueryResult:
    """Evaluate a query over a compressed stream without a host round trip
    of the decompressed data (unless materialize=True)."""
    import jax.numpy as jnp

    from .. import decoder as _dec

    udt = np.uint8 if elem_sz == 1 else np.uint16
    ngroups, remaining_len, ndims = read_metadata_rle(buf)

    if ngroups == 0 and remaining_len < MIN_DATA_SIZE:
        body = np.frombuffer(buf, dtype=udt, count=remaining_len,
                             offset=METADATA_LEN_RLE)
        rows = body.reshape(-1, ndims) if ndims else body.reshape(-1, 1)
        return _finish(rows, rows.shape[0], params)

    lowdim = ndims <= LOWDIM_MAX_NDIMS[elem_sz]
    idx = _dec.walk_headers(buf, ngroups, ndims, elem_sz, lowdim=lowdim)
    dense = _dec.gather_payloads(buf, idx, ndims, elem_sz, lowdim)

    from ..utils.shapes import next_bucket, pad_rows

    ndata = dense.shape[0]
    nd_pad = next_bucket(max(ndata, 1))
    rows_pad = next_bucket(max(idx.total_rows, 1))
    out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows_p[:ndata] = idx.out_rows
    vals = _dec._decode_pass(
        jnp.asarray(pad_rows(dense, nd_pad)),
        jnp.asarray(pad_rows(idx.widths, nd_pad)),
        jnp.asarray(out_rows_p, jnp.int32),
        codec, elem_sz, lowdim, rows_pad)
    vals = vals[: idx.total_rows]

    tail = np.frombuffer(buf, dtype=udt, count=remaining_len,
                         offset=idx.tail_offset)
    tail_rows = tail[: (remaining_len // ndims) * ndims].reshape(-1, ndims)

    res = QueryResult(data=None)
    if params.op != Operation.NOOP:
        dev = np.asarray(_reduce_pass(vals, params.op))
        if params.op == Operation.REDUCE_MAX:
            m = dev.astype(np.int64)
            if tail_rows.size:
                m = np.maximum(m, tail_rows.max(axis=0))
            res.max = m.astype(udt)
        elif params.op == Operation.REDUCE_MIN:
            m = dev.astype(np.int64)
            if tail_rows.size:
                m = np.minimum(m, tail_rows.min(axis=0))
            res.min = m.astype(udt)
        else:
            s = dev.astype(np.int64)
            if tail_rows.size:
                s = s + tail_rows.sum(axis=0, dtype=np.int64)
            res.sum = s
    if params.materialize:
        body = np.asarray(vals).astype(udt).reshape(-1)
        res.data = np.concatenate([body, tail]).reshape(-1, ndims) \
            if ndims else np.concatenate([body, tail])[:, None]
    return res


def _finish(rows: np.ndarray, nrows: int, params: QueryParams) -> QueryResult:
    res = QueryResult(data=rows if params.materialize else None)
    if params.op == Operation.REDUCE_MAX:
        res.max = rows.max(axis=0) if nrows else None
    elif params.op == Operation.REDUCE_MIN:
        res.min = rows.min(axis=0) if nrows else None
    elif params.op == Operation.REDUCE_SUM:
        res.sum = rows.sum(axis=0, dtype=np.int64) if nrows else None
    return res
