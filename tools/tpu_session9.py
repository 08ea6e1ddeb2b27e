"""TPU session 9: device A/B of the dmajor-v2 lowdim passes.

Session-7 lessons: hierarchical_cumsum_last (4, 1M) ran 99 us — 27x
faster than the axis-0 prefix — but dmajor-v1's (D, nb, 8) stacks /
(D, N) materialization ate the win (v1 full decode 6303 us vs legacy
2524). v2 keeps the 8 sample slots as separate (D, nb) arrays (no
small-minor tensor ever exists), decomposes the prefix into 8 static
adds + one (D, nb) cumsum, and interleaves once via a u32-word
transpose.

Grid (pure XLA): decode d4u8/d2u16/d1u8 legacy vs dmajor-v2;
encode pass same three configs legacy vs dmajor-v2 (device byte-equal
checked against legacy each time).

Run detached:  nohup python -u tools/tpu_session9.py > /tmp/tpu_session9.log 2>&1 &
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
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    rawl1 = (np.cumsum(rng.integers(-6, 7, (nrl, 1)), axis=0) % 256
             ).astype(np.uint8)

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

    # ---- decode A/B ---------------------------------------------------
    for raw, D, esz, tag in ((rawl8, 4, 1, "d4 u8"),
                             (rawl16, 2, 2, "d2 u16"),
                             (rawl1, 1, 1, "d1 u8")):
        idx, dj, wj = prep(raw, D, esz)

        def kern(d, w, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, True)

        for flag, name in ((False, "legacy"), (True, "dmajor2")):
            decoder.LOWDIM_DMAJOR = flag
            jax.clear_caches()
            check_time(f"delta {tag} lowdim decode [{name}]",
                       kern, (dj, wj), raw, idx.total_rows)

    # ---- encode A/B ---------------------------------------------------
    for raw, esz, tag in ((rawl8, 1, "d4 u8"), (rawl16, 2, "d2 u16"),
                          (rawl1, 1, "d1 u8")):
        rows = jnp.asarray(raw)

        def kern(r, esz=esz):
            w, h, d, s = encoder._encode_pass.__wrapped__(
                r, "delta", esz, True)
            return w.astype(jnp.int32), h.astype(jnp.int32), d, s

        outs = {}
        for flag, name in ((False, "legacy"), (True, "dmajor2")):
            encoder.LOWDIM_DMAJOR = flag
            jax.clear_caches()
            outs[name] = [np.asarray(o) for o in jax.jit(kern)(rows)]
            ok = all(np.array_equal(a, b) for a, b in
                     zip(outs["legacy"], outs[name]))
            if SMOKE:
                print(f"encode {tag} [{name}]: exact={ok} (smoke)",
                      flush=True)
                assert ok
                continue
            t = devloop_time(kern, (rows,), 16)
            print(f"lowdim encode pass {tag} [{name}]  exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)

    decoder.LOWDIM_DMAJOR = True
    encoder.LOWDIM_DMAJOR = True
    print("SESSION9 DONE", flush=True)


if __name__ == "__main__":
    main()
