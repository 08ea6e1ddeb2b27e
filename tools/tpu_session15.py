"""TPU session 15: block-gather runs timeline A/B (rowmajor + lowdim d3).

The runs-stream timeline was a (ndata*8, D) row scatter — 5.02 GB/s on
d64 u8 (session 4) vs 18 GB/s contiguous, i.e. ~100% of runs-decode wall
time. Run starts are 8-aligned (RLE unit = whole blocks), so the
timeline is equivalently ONE tiny (ndata,) index scatter plus a
major-axis gather of whole blocks (full minor tiles). This session A/Bs
decoder.RUNS_TIMELINE = scatter | gather for rowmajor delta u8/u16, xff
u8, and the lowdim d3 legacy pass (d1/d2/d4 use the grouped flat-scatter
path, session 14).

Run detached:  nohup python -u tools/tpu_session15.py > /tmp/tpu_session15.log 2>&1 &
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
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)

    def mkruns(n, D, esz):
        lim = 6 if esz == 1 else 300
        dt = np.uint8 if esz == 1 else np.uint16
        seg = rng.integers(-lim, lim + 1, (n, D))
        mask = (np.arange(n) // 256 % 3 == 0)[:, None]  # 1/3 rows in runs
        return (np.cumsum(np.where(mask, 0, seg), axis=0)
                % (1 << (8 * esz))).astype(dt)

    def prep_runs(raw, D, esz, codec, lowdim):
        s = encoder.compress(raw.reshape(-1), D, codec=codec, elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=lowdim)
        dense = decoder.gather_payloads(s, idx, D, esz, lowdim)
        ndata = dense.shape[0]
        rows_pad = next_bucket(int(idx.total_rows))
        nd_pad = next_bucket(ndata)
        out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
        out_rows_p[:ndata] = idx.out_rows
        dj = jnp.asarray(pad_rows(dense, nd_pad))
        wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
        orp = jnp.asarray(out_rows_p, jnp.int32)
        return idx, dj, wj, orp, rows_pad

    # lowdim d3 keeps the legacy pass (session 12: grouped loses at d3)
    cases = (
        ("delta d64 u8 rowmajor", 1 << 17, 64, 1, "delta", False),
        ("delta d16 u16 rowmajor", 1 << 17, 16, 2, "delta", False),
        ("xff   d64 u8 rowmajor", 1 << 17, 64, 1, "xff", False),
        ("delta d3  u8 lowdim", 1 << 13 if SMOKE else 1 << 20, 3, 1,
         "delta", True),
    )
    for tag, n, D, esz, codec, lowdim in cases:
        if SMOKE:
            n = min(n, 1 << 13)
        raw = mkruns(n, D, esz)
        idx, dj, wj, orp, rows_pad = prep_runs(raw, D, esz, codec, lowdim)

        def skern(d, w, o, codec=codec, esz=esz, lowdim=lowdim,
                  rows_pad=rows_pad):
            return decoder._decode_pass.__wrapped__(
                d, w, o, codec, esz, lowdim, rows_pad)

        for name in ("scatter", "gather"):
            decoder.RUNS_TIMELINE = name
            jax.clear_caches()
            got = np.asarray(jax.jit(skern)(dj, wj, orp))
            tr = int(idx.total_rows)  # 8-row verbatim tail is host-side
            ok = np.array_equal(got[:tr].astype(np.int64),
                                raw[:tr].astype(np.int64))
            if SMOKE:
                print(f"runs {tag} [{name}]: exact={ok} (smoke)", flush=True)
                assert ok, (tag, name)
                continue
            t = devloop_time(skern, (dj, wj, orp), 16)
            print(f"runs {tag} [{name:7s}]  exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)

    print("SESSION15 DONE", flush=True)


if __name__ == "__main__":
    main()
