"""TPU session 7: device A/B of the dim-major lowdim decode.

Session-6 diagnosis: every lowdim stage ran ~30x under the elementwise
ceiling because all tensors carried the D <= 4 dim axis minor. The
dmajor pipeline keeps the sample axis minor end to end (u32 bitcasts at
the boundaries). Baselines (session 6): d4 u8 1.65, d2 u16 2.41,
d1 u8 2.99 GB/s.

Grid (pure XLA, no fault risk; each exactness-checked before timing):
  1. decode d4 u8 / d2 u16 / d1 u8: legacy vs dmajor
  2. stage: hierarchical_cumsum_last (4, 1M) vs axis-0 (1M, 4) baseline
     (2663 us in session 6)

Run detached:  nohup python -u tools/tpu_session7.py > /tmp/tpu_session7.log 2>&1 &
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
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)

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

    def time_only(tag, kern, args, nbytes, iters=16):
        if SMOKE:
            jax.block_until_ready(jax.jit(kern)(*args))
            print(f"{tag:52s} compiled+ran (smoke)", flush=True)
            return
        t = devloop_time(kern, args, iters)
        print(f"{tag:52s} {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

    def set_dmajor(flag):
        decoder.LOWDIM_DMAJOR = flag
        jax.clear_caches()

    # ---- 1. lowdim decode A/B -----------------------------------------
    nrl = 1 << 13 if SMOKE else 1 << 20
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    rawl1 = (np.cumsum(rng.integers(-6, 7, (nrl, 1)), axis=0) % 256
             ).astype(np.uint8)
    idx8, dj8, wj8 = prep(rawl8, 4, 1)
    idx16, dj16, wj16 = prep(rawl16, 2, 2)
    idx1, dj1, wj1 = prep(rawl1, 1, 1)

    def kern8(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, True)

    def kern16(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 2, True)

    for flag, tag in ((False, "legacy"), (True, "dmajor")):
        set_dmajor(flag)
        check_time(f"delta/u8 d4 lowdim decode [{tag}]",
                   kern8, (dj8, wj8), rawl8, idx8.total_rows)
    for flag, tag in ((False, "legacy"), (True, "dmajor")):
        set_dmajor(flag)
        check_time(f"delta/u16 d2 lowdim decode [{tag}]",
                   kern16, (dj16, wj16), rawl16, idx16.total_rows)
    for flag, tag in ((False, "legacy"), (True, "dmajor")):
        set_dmajor(flag)
        check_time(f"delta/u8 d1 lowdim decode [{tag}]",
                   kern8, (dj1, wj1), rawl1, idx1.total_rows)

    # ---- 2. prefix stage: last-axis vs axis-0 -------------------------
    x_dm = jnp.zeros((4, nrl), jnp.int32)
    time_only("stage: hierarchical_cumsum_last (4, 1M)",
              lambda x: fc.hierarchical_cumsum_last(x, value_bits=8),
              (x_dm,), rawl8.nbytes)

    set_dmajor(True)
    print("SESSION7 DONE", flush=True)


if __name__ == "__main__":
    main()
