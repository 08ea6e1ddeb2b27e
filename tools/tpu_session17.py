"""TPU session 17: query-pushdown compact pass + batched decode numbers.

Two components with no device measurements yet:
- Query pushdown (VERDICT r1 weak 6): the compact O(data-blocks) delta
  pass vs the fused O(rows) pass on a 99%-RLE stream — the timing
  evidence that runs really cost O(1).
- decompress_batch: S small xff streams vmapped into one device pass
  (FIRE scan runs S*D lanes wide) vs decoding them serially.

Run detached:  nohup python -u tools/tpu_session17.py > /tmp/tpu_session17.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.query import pushdown
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)

    # ---- 99%-RLE stream: compact vs fused sum --------------------------
    n = 1 << 14 if SMOKE else 1 << 20
    D = 64
    seg = rng.integers(-6, 7, (n, D))
    mask = (np.arange(n) % 128 != 0)[:, None]  # ~99% of rows in runs
    raw = (np.cumsum(np.where(mask, 0, seg), axis=0) % 256).astype(np.uint8)
    s = encoder.compress(raw.reshape(-1), D, codec="delta", elem_sz=1)
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, D, 1, lowdim=False)
    dense = decoder.gather_payloads(s, idx, D, 1, False)
    ndata = dense.shape[0]
    nd_pad = next_bucket(max(ndata, 1))
    print(f"stream: {n} rows, {ndata} data blocks "
          f"({100 * (1 - ndata * 8 / n):.1f}% run rows), "
          f"{len(s)} bytes", flush=True)

    gaps = np.zeros(nd_pad, np.int64)
    gaps[:ndata] = np.diff(idx.out_rows, prepend=-8) - 8
    trailing = idx.total_rows - (int(idx.out_rows[-1]) + 8)
    dj = jnp.asarray(pad_rows(dense, nd_pad))
    wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
    gj = jnp.asarray(gaps, jnp.int32)
    op = pushdown.Operation.REDUCE_SUM.value

    def compact_kern(d, w, g):
        return pushdown._compact_delta_pass(
            d, w, g, jnp.int32(trailing), jnp.int32(ndata), 1, False, op)

    rows_pad = next_bucket(max(idx.total_rows, 1))
    out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows_p[:ndata] = idx.out_rows
    orj = jnp.asarray(out_rows_p, jnp.int32)

    def fused_kern(d, w, o):
        red, _ = pushdown._fused_pass(
            d, w, o, jnp.int32(idx.total_rows), "delta", 1, False,
            rows_pad, op, False)
        return red

    got_c = np.asarray(jax.jit(compact_kern)(dj, wj, gj)).astype(np.int64)
    got_f = np.asarray(jax.jit(fused_kern)(dj, wj, orj)).astype(np.int64)
    # host truth (mod 2^32, matching i32 device accumulators)
    tr = int(idx.total_rows)
    want = raw[:tr].astype(np.int64).sum(axis=0) % (1 << 32)
    ok_c = np.array_equal(got_c % (1 << 32), want)
    ok_f = np.array_equal(got_f % (1 << 32), want)
    if SMOKE:
        print(f"query sum compact={ok_c} fused={ok_f} (smoke)", flush=True)
        assert ok_c and ok_f
    else:
        t_c = devloop_time(compact_kern, (dj, wj, gj), 16)
        t_f = devloop_time(fused_kern, (dj, wj, orj), 16)
        print(f"query sum 99%-RLE compact  exact={ok_c}  {t_c * 1e6:9.1f} us"
              f"  {raw.nbytes / t_c / 1e9:7.2f} GB/s(logical)", flush=True)
        print(f"query sum 99%-RLE fused    exact={ok_f}  {t_f * 1e6:9.1f} us"
              f"  {raw.nbytes / t_f / 1e9:7.2f} GB/s(logical)", flush=True)

    # ---- batched small-stream decode (xff, S streams, S*D lanes) ------
    S = 8 if SMOKE else 128
    nr = 1 << 10 if SMOKE else 1 << 12
    Db = 8
    raws = [(np.cumsum(rng.integers(-6, 7, (nr, Db)), axis=0) % 256
             ).astype(np.uint8) for _ in range(S)]
    bufs = [encoder.compress(r.reshape(-1), Db, codec="xff", elem_sz=1)
            for r in raws]
    idxs = [decoder.walk_headers(b, read_metadata_rle(b)[0], Db, 1,
                                 lowdim=False) for b in bufs]
    denses = [decoder.gather_payloads(b, i, Db, 1, False)
              for b, i in zip(bufs, idxs)]
    nd_pad = next_bucket(max(d.shape[0] for d in denses))
    maxb = max(d.shape[2] for d in denses)
    dense_b = np.zeros((S, nd_pad, 8, maxb), np.uint8)
    widths_b = np.zeros((S, nd_pad, Db), np.int32)
    for si, d in enumerate(denses):
        dense_b[si, : d.shape[0], :, : d.shape[2]] = d
        widths_b[si, : d.shape[0]] = idxs[si].widths
    dbj = jnp.asarray(dense_b)
    wbj = jnp.asarray(widths_b)

    def batch_kern(d, w):
        return decoder._decode_pass_contiguous_batch.__wrapped__(
            d, w, "xff", 1, False)

    got = np.asarray(jax.jit(batch_kern)(dbj, wbj))
    ok = all(
        np.array_equal(got[si, : idxs[si].total_rows].astype(np.int64),
                       raws[si][: idxs[si].total_rows].astype(np.int64))
        for si in range(S))
    total_bytes = sum(r.nbytes for r in raws)
    if SMOKE:
        print(f"batched xff decode S={S}: exact={ok} (smoke)", flush=True)
        assert ok
    else:
        t_b = devloop_time(batch_kern, (dbj, wbj), 16)
        # serial comparison: one stream at a time through the same pass
        def one_kern(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "xff", 1, False)
        t_1 = devloop_time(one_kern, (dbj[0], wbj[0]), 16)
        print(f"batched xff decode S={S}    exact={ok}  {t_b * 1e6:9.1f} us"
              f"  {total_bytes / t_b / 1e9:6.2f} GB/s", flush=True)
        print(f"serial xff decode x{S}     ~{S * t_1 * 1e6:9.1f} us  "
              f"{total_bytes / (S * t_1) / 1e9:6.2f} GB/s", flush=True)

    print("SESSION17 DONE", flush=True)


if __name__ == "__main__":
    main()
