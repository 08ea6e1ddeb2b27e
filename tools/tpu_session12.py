"""TPU session 12: grouped lowdim decode A/B (+ scatter-path variant).

Hypothesis from sessions 6-11: every lowdim formulation so far keeps
some N-scale tensor with a small minor/second-minor dim ((N, D) minor 4
= 32x lane padding; (D, nb) slots; (c, 8, D, EB) einsum batch). The
grouped pass folds G = 128/D consecutive blocks into the einsum's dim
axis so all N-scale tensors are (c, 8, ~128) — full (8, 128) tiles.
Measures decode d4u8/d2u16/d1u8/d3u8 legacy vs grouped, plus the
runs-stream scatter path with grouped unpack.

Run detached:  nohup python -u tools/tpu_session12.py > /tmp/tpu_session12.log 2>&1 &
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
    nrl = 1 << 13 if SMOKE else 1 << 20

    def mkraw(D, esz):
        lim = 6 if esz == 1 else 300
        dt = np.uint8 if esz == 1 else np.uint16
        return (np.cumsum(rng.integers(-lim, lim + 1, (nrl, D)), axis=0)
                % (1 << (8 * esz))).astype(dt)

    def prep(raw, D, elem_sz):
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, elem_sz, lowdim=True)
        dense = decoder.gather_payloads(s, idx, D, elem_sz, True)
        nd = next_bucket(dense.shape[0])
        dj = jnp.asarray(pad_rows(dense, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))
        return idx, dj, wj

    def check_time(tag, kern, args, raw, nrows_packed, iters=16):
        got = np.asarray(jax.jit(kern)(*args))
        ok = np.array_equal(got[:nrows_packed].astype(np.int64),
                            raw[:nrows_packed].astype(np.int64))
        if SMOKE:
            print(f"{tag:52s} exact={ok}  (smoke)", flush=True)
            assert ok, tag
            return
        t = devloop_time(kern, args, iters)
        print(f"{tag:52s} exact={ok}  {t * 1e6:9.1f} us  "
              f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    # ---- contiguous decode A/B -----------------------------------------
    for D, esz, tag in ((4, 1, "d4 u8"), (2, 2, "d2 u16"), (1, 1, "d1 u8"),
                        (3, 1, "d3 u8")):
        raw = mkraw(D, esz)
        idx, dj, wj = prep(raw, D, esz)

        def kern(d, w, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, True)

        for name in ("legacy", "grouped"):
            decoder.LOWDIM_PASS = name
            jax.clear_caches()
            check_time(f"delta {tag} lowdim decode [{name}]",
                       kern, (dj, wj), raw, idx.total_rows)

    # ---- runs-stream scatter path with grouped unpack -------------------
    mask = (np.arange(nrl) // 256 % 3 == 0)[:, None]  # 1/3 rows in runs
    seg = rng.integers(-6, 7, (nrl, 4))
    rawr = (np.cumsum(np.where(mask, 0, seg), axis=0) % 256).astype(np.uint8)
    sr = encoder.compress(rawr.reshape(-1), 4, codec="delta", elem_sz=1)
    ngr, _, _ = read_metadata_rle(sr)
    idxr = decoder.walk_headers(sr, ngr, 4, 1, lowdim=True)
    denser = decoder.gather_payloads(sr, idxr, 4, 1, True)
    ndata = denser.shape[0]
    rows_pad = next_bucket(idxr.total_rows)
    nd_pad = next_bucket(ndata)
    out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows_p[:ndata] = idxr.out_rows
    dj = jnp.asarray(pad_rows(denser, nd_pad))
    wj = jnp.asarray(pad_rows(idxr.widths, nd_pad))
    orp = jnp.asarray(out_rows_p, jnp.int32)

    def skern(d, w, o):
        return decoder._decode_pass.__wrapped__(
            d, w, o, "delta", 1, True, rows_pad)

    for name in ("legacy", "grouped"):
        decoder.LOWDIM_PASS = name
        jax.clear_caches()
        got = np.asarray(jax.jit(skern)(dj, wj, orp))
        tr = int(idxr.total_rows)  # the 8-row verbatim tail is host-side
        ok = np.array_equal(got[:tr].astype(np.int64),
                            rawr[:tr].astype(np.int64))
        if SMOKE:
            print(f"scatter runs d4 [{name}]: exact={ok} (smoke)",
                  flush=True)
            assert ok
            continue
        t = devloop_time(skern, (dj, wj, orp), 16)
        print(f"scatter runs d4 [{name}]  exact={ok}  {t * 1e6:9.1f} us  "
              f"{rawr.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    print("SESSION12 DONE", flush=True)


if __name__ == "__main__":
    main()
