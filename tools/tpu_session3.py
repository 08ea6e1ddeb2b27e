"""TPU session 3: validate bench under the new defaults + FIRE unroll sweep.

New defaults since session 2: s8 triangular prefix (chunk 256), native
payload gather, seekable API. This session (a) proves the driver's
`python bench.py` compiles and runs end-to-end with these defaults on the
real chip, and (b) sweeps the FIRE scan unroll for the serial xff path.
Pure XLA — no fault risk.

Run detached:  nohup python -u tools/tpu_session3.py > /tmp/tpu_session3.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    # ---- 1. the driver bench exactly as the driver runs it -------------
    from bench import devloop_time, main as bench_main

    try:
        bench_main()
    except Exception as e:
        print(f"BENCH FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- 2. serial FIRE unroll sweep -----------------------------------
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)
    D, nrows = 64, 1 << 17
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    s2 = encoder.compress(raw.reshape(-1), D, codec="xff")
    ng2, _, _ = read_metadata_rle(s2)
    idx2 = decoder.walk_headers(s2, ng2, D, 1, lowdim=False)
    d2 = decoder.gather_payloads(s2, idx2, D, 1, False)
    nd2 = next_bucket(d2.shape[0])
    dj = jnp.asarray(pad_rows(d2, nd2))
    wj = jnp.asarray(pad_rows(idx2.widths, nd2))

    def kern(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "xff", 1, False)

    for unroll in (8, 16, 32):
        fc.SCAN_UNROLL = unroll
        jax.clear_caches()
        try:
            got = np.asarray(jax.jit(kern)(dj, wj))
            ok = np.array_equal(
                got[: nrows].astype(np.int64), raw.astype(np.int64))
            t = devloop_time(kern, (dj, wj), 16)
            print(f"xff_serial[unroll={unroll}] exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"xff_serial[unroll={unroll}] FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    print("SESSION3 DONE", flush=True)


if __name__ == "__main__":
    main()
