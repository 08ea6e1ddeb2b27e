"""TPU session 43: flat params for lowdim decode + u16 encode; unpack
weight-layout and chunking A/Bs on the flat d64 headline.

Follow-ups to session 42 (VERDICT r4 items 1 and 3):

Part A (u8 d64, flat params everywhere):
  wl=transpose vs wl=dot   - one-hot built in (c,D,MAXB)+transpose vs
                             directly in the (c,MAXB,D) dot layout
  chunk=8192 vs 16384      - does the lax.map chunking of the unpack
                             cost anything at nb=16384?
Part B (lowdim decode, 1M rows): full pass with 2-D params (production
  r4) vs FLAT params — d4 u8 (grouped), d2 u16 (grouped), d3 u8
  (legacy+jsel). Decode twin of the session-41 encode result.
Part C (u16 lowdim encode d1/d2): production dmajor vs the flat pass
  (the "pending measurement" row from session 41).

Run:  timeout 5400 python -u tools/tpu_session43.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session43.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"


def _eq(a, b) -> bool:
    import jax
    import jax.numpy as jnp

    return bool(jax.jit(jnp.array_equal)(a, b))


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(43)
    iters = 2 if SMOKE else 32

    def prep(nrows, ndims, esz, lowdim):
        hi = 1 << (8 * esz)
        dt = np.uint8 if esz == 1 else np.uint16
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0)
               % hi).astype(dt)
        s = encoder.compress(raw.reshape(-1), ndims, codec="delta")
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, ndims, esz, lowdim=lowdim)
        dense = decoder.gather_payloads(s, idx, ndims, esz, lowdim)
        assert idx.total_rows == idx.widths.shape[0] * 8
        nd_pad = next_bucket(dense.shape[0])
        return raw, pad_rows(dense, nd_pad), pad_rows(idx.widths, nd_pad)

    def bench_one(name, fn, args, nbytes):
        try:
            t = devloop_time(fn, args, iters)
            print(f"  {name:>16}: {nbytes / t / 1e9:6.2f} GB/s "
                  f"({t * 1e6:.0f} us)", flush=True)
        except Exception as e:
            print(f"  {name:>16}: DIED {type(e).__name__} {str(e)[:70]}",
                  flush=True)
            jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)

    # ---------------- Part A: u8 d64 wlayout + chunking ----------------
    nrows = 1 << (12 if SMOKE else 17)
    raw, dense, widths = prep(nrows, 64, 1, False)
    nbytes = raw.nbytes
    nb_pad, _, maxb = dense.shape
    dfl = jnp.asarray(dense.reshape(-1))
    wfl = jnp.asarray(widths.reshape(-1))
    print(f"-- A: u8 d64 {nrows} rows, dense {dense.shape}", flush=True)

    def fullfl(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nb_pad, 8, maxb), wf.reshape(nb_pad, 64),
            "delta", 1, False)

    ref = jax.jit(fullfl)(dfl, wfl)
    ref.block_until_ready()

    for rep in range(2):
        for wl, chunk in [("transpose", 8192), ("dot", 8192),
                          ("transpose", 16384)]:
            pack.UNPACK_WLAYOUT = wl
            pack._CHUNK = chunk
            jax.clear_caches()
            if rep == 0:
                ok = _eq(ref, jax.jit(fullfl)(dfl, wfl))
                if not ok:
                    print(f"  wl={wl} chunk={chunk}: NOT EXACT, skip",
                          flush=True)
                    continue
            bench_one(f"wl={wl[:5]} c={chunk}", fullfl, (dfl, wfl), nbytes)
    pack.UNPACK_WLAYOUT = "transpose"
    pack._CHUNK = 8192
    jax.clear_caches()

    # ---------------- Part B: lowdim decode flat A/B ----------------
    for D, esz in [(4, 1), (2, 2), (3, 1)] if not SMOKE else [(3, 1)]:
        # 8 MiB streams — the session-38/39 lowdim operating point
        nr = (1 << (13 if SMOKE else 23)) // esz // D
        nr -= nr % 8
        raw, dense, widths = prep(nr, D, esz, True)
        nbytes = raw.nbytes
        nb_pad = dense.shape[0]
        d1, d2 = dense.shape[1], dense.shape[2]
        dj = jnp.asarray(dense)
        wj = jnp.asarray(widths)
        dfl = jnp.asarray(dense.reshape(-1))
        wfl = jnp.asarray(widths.reshape(-1))
        print(f"-- B: d{D} u{8*esz} lowdim {nr} rows, dense {dense.shape}",
              flush=True)

        def full2d(d, w, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, True)

        def fullfl_ld(df, wf, nb_pad=nb_pad, d1=d1, d2=d2, D=D, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nb_pad, d1, d2), wf.reshape(nb_pad, D),
                "delta", esz, True)

        ref = jax.jit(full2d)(dj, wj)
        ref.block_until_ready()
        print(f"  flat exact: {_eq(ref, jax.jit(fullfl_ld)(dfl, wfl))}",
              flush=True)
        for rep in range(2):
            bench_one(f"d{D}u{8*esz} 2d", full2d, (dj, wj), nbytes)
            bench_one(f"d{D}u{8*esz} flat", fullfl_ld, (dfl, wfl), nbytes)

    # ---------------- Part C: u16 lowdim flat encode ----------------
    for D in ([1, 2] if not SMOKE else [2]):
        nr = (1 << (12 if SMOKE else 22)) // D
        nr -= nr % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
               % 65536).astype(np.uint16)
        nbytes = raw.nbytes
        rows2d = jnp.asarray(raw)
        flat_j = jnp.asarray(raw.reshape(-1))
        print(f"-- C: u16 d{D} encode, {nr} rows", flush=True)

        def enc2d(r, D=D):
            return encoder._encode_pass.__wrapped__(r, "delta", 2, True)

        def encfl(f, D=D):
            return encoder._encode_pass.__wrapped__(
                f, "delta", 2, True, flat_ndims=D)

        a = jax.jit(enc2d)(rows2d)
        jax.block_until_ready(a)
        b = jax.jit(encfl)(flat_j)
        ok = all(_eq(x, y) for x, y in zip(a[:3], b[:3]))
        print(f"  flat encode exact: {ok}", flush=True)
        for rep in range(2):
            bench_one(f"u16 d{D} enc2d", enc2d, (rows2d,), nbytes)
            bench_one(f"u16 d{D} encfl", encfl, (flat_j,), nbytes)
    print("SESSION43 DONE", flush=True)


if __name__ == "__main__":
    main()
