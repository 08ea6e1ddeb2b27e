"""TPU session 14: flat-scatter grouped runs decode A/B + auto-default checks.

Session 12 measured the runs-stream lowdim scatter at 0.09 GB/s for both
passes — but that run predates the flat-scatter grouped runs path
(decoder._decode_lowdim_grouped_scatter): one int32 word per row (lowdim
row_b = D*elem_sz <= 4), 1-D scatter on a full-minor flat timeline, no
(N, D<=4) minor-4 tensor anywhere. This session A/Bs it against the
legacy row scatter, checks the untested auto-default combos (d1 u16
contiguous, xff lowdim runs with grouped unpack), and sanity-checks the
headline rowmajor numbers under the new defaults.

Run detached:  nohup python -u tools/tpu_session14.py > /tmp/tpu_session14.log 2>&1 &
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

    def mkruns(D, esz, codec="delta"):
        lim = 6 if esz == 1 else 300
        dt = np.uint8 if esz == 1 else np.uint16
        seg = rng.integers(-lim, lim + 1, (nrl, D))
        mask = (np.arange(nrl) // 256 % 3 == 0)[:, None]  # 1/3 rows in runs
        return (np.cumsum(np.where(mask, 0, seg), axis=0)
                % (1 << (8 * esz))).astype(dt)

    def prep_runs(raw, D, esz, codec):
        s = encoder.compress(raw.reshape(-1), D, codec=codec, elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=True)
        dense = decoder.gather_payloads(s, idx, D, esz, True)
        ndata = dense.shape[0]
        rows_pad = next_bucket(int(idx.total_rows))
        nd_pad = next_bucket(ndata)
        out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
        out_rows_p[:ndata] = idx.out_rows
        dj = jnp.asarray(pad_rows(dense, nd_pad))
        wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
        orp = jnp.asarray(out_rows_p, jnp.int32)
        return idx, dj, wj, orp, rows_pad

    # ---- runs-stream lowdim decode: legacy row scatter vs flat-scatter --
    for D, esz, tag in ((4, 1, "d4 u8"), (2, 2, "d2 u16"), (1, 1, "d1 u8")):
        raw = mkruns(D, esz)
        idx, dj, wj, orp, rows_pad = prep_runs(raw, D, esz, "delta")

        def skern(d, w, o, esz=esz, rows_pad=rows_pad):
            return decoder._decode_pass.__wrapped__(
                d, w, o, "delta", esz, True, rows_pad)

        for name in ("legacy", "grouped"):
            decoder.LOWDIM_PASS = name
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
            print(f"runs {tag} lowdim decode [{name:7s}]  exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)

    decoder.LOWDIM_PASS = "auto"
    jax.clear_caches()

    # ---- auto-default: d1 u16 contiguous (grouped, untested combo) ------
    for D, esz, tag in ((1, 2, "d1 u16"),):
        lim = 300
        raw = (np.cumsum(rng.integers(-lim, lim + 1, (nrl, D)), axis=0)
               % 65536).astype(np.uint16)
        s = encoder.compress(raw.reshape(-1), D, codec="delta", elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=True)
        dense = decoder.gather_payloads(s, idx, D, esz, True)
        nd = next_bucket(dense.shape[0])
        dj = jnp.asarray(pad_rows(dense, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))

        def ckern(d, w, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, True)

        got = np.asarray(jax.jit(ckern)(dj, wj))
        ok = np.array_equal(got[: idx.total_rows].astype(np.int64),
                            raw[: idx.total_rows].astype(np.int64))
        if SMOKE:
            print(f"auto {tag} contiguous: exact={ok} (smoke)", flush=True)
            assert ok
        else:
            t = devloop_time(ckern, (dj, wj), 16)
            print(f"auto {tag} contiguous decode     exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)

    # ---- auto-default: xff lowdim runs (grouped unpack, scatter path) ---
    raw = mkruns(4, 1)
    idx, dj, wj, orp, rows_pad = prep_runs(raw, 4, 1, "xff")

    def xkern(d, w, o):
        return decoder._decode_pass.__wrapped__(
            d, w, o, "xff", 1, True, rows_pad)

    got = np.asarray(jax.jit(xkern)(dj, wj, orp))
    tr = int(idx.total_rows)
    ok = np.array_equal(got[:tr].astype(np.int64),
                        raw[:tr].astype(np.int64))
    if SMOKE:
        print(f"auto xff d4 u8 runs: exact={ok} (smoke)", flush=True)
        assert ok
    else:
        t = devloop_time(xkern, (dj, wj, orp), 16)
        print(f"auto xff d4 u8 runs decode     exact={ok}  "
              f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
              flush=True)

    # ---- headline sanity: rowmajor d64 u8 contiguous under new defaults -
    if not SMOKE:
        nr = 1 << 17  # 8 MiB
        raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
               % 256).astype(np.uint8)
        s = encoder.compress(raw.reshape(-1), 64, codec="delta", elem_sz=1)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, 64, 1, lowdim=False)
        dense = decoder.gather_payloads(s, idx, 64, 1, False)
        nd = next_bucket(dense.shape[0])
        dj = jnp.asarray(pad_rows(dense, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))

        def hkern(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", 1, False)

        got = np.asarray(jax.jit(hkern)(dj, wj))
        ok = np.array_equal(got[: idx.total_rows].astype(np.int64),
                            raw[: idx.total_rows].astype(np.int64))
        t = devloop_time(hkern, (dj, wj), 16)
        print(f"headline rowmajor d64 u8       exact={ok}  "
              f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
              flush=True)

    print("SESSION14 DONE", flush=True)


if __name__ == "__main__":
    main()
