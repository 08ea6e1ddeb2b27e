"""TPU session 55: u16 unpack isolation + nwin-2-era curve cells.

Evidence polish for the final round state:
A. u16 d64 isolated unpack (flat params) — the one missing row of the
   round-5 roofline table (u8: 37; prefix16: ~74; full u16 pass: 49).
B. The maxb-16 u8 curve cells (d31/d32/d33) re-measured under the
   session-52 two-window default (session 45 measured them pre-nwin2:
   7.16 / 8.11 / 7.48 decode).

Run:  timeout 3600 python -u tools/tpu_session55.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(55)

    def prep(ndims, elem_sz):
        eb = 8 * elem_sz
        dt = np.uint8 if elem_sz == 1 else np.uint16
        nr = (1 << 23) // elem_sz // ndims
        nr -= nr % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nr, ndims)), axis=0)
               % (1 << eb)).astype(dt)
        s = encoder.compress(raw.reshape(-1), ndims, codec="delta",
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, ndims, elem_sz, lowdim=False)
        dense = decoder.gather_payloads(s, idx, ndims, elem_sz, False)
        assert idx.total_rows == idx.widths.shape[0] * 8
        nd = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd)
        wp = pad_rows(idx.widths, nd)
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        return raw, dfl, wfl, nd, dp.shape[2]

    # ---------------- A: u16 isolated unpack ----------------
    raw16, dfl16, wfl16, nd16, mb16 = prep(64, 2)
    print(f"-- A: u16 d64, nb {nd16}, maxb {mb16}", flush=True)

    def unp16(df, wf):
        return pack.unpack_rows_rowmajor(
            df.reshape(nd16, 8, mb16).astype(jnp.int32),
            wf.reshape(nd16, 64).astype(jnp.int32), elem_sz=2)

    for rep in range(2):
        t = devloop_time(unp16, (dfl16, wfl16), 16)
        print(f"  u16 isolated unpack: {raw16.nbytes / t / 1e9:6.2f} GB/s",
              flush=True)

    # ---------------- B: d31/32/33 u8 cells, 2-window era ----------------
    for D in (31, 32, 33):
        raw, dfl, wfl, nd, mb = prep(D, 1)
        print(f"-- B: u8 d{D}, nb {nd}, maxb {mb}", flush=True)

        def full(df, wf, nd=nd, mb=mb, D=D):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd, 8, mb), wf.reshape(nd, D), "delta", 1,
                False)

        for rep in range(2):
            t = devloop_time(full, (dfl, wfl), 16)
            print(f"  u8 d{D} decode: {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)
        rows_j = jnp.asarray(raw)

        def kern_e(r):
            return encoder._encode_pass.__wrapped__(r, "delta", 1, False)

        t = devloop_time(kern_e, (rows_j,), 16)
        print(f"  u8 d{D} encode (narrow): {raw.nbytes / t / 1e9:6.2f} GB/s",
              flush=True)
    print("SESSION55 DONE", flush=True)


if __name__ == "__main__":
    main()
