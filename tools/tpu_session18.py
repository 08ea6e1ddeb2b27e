"""TPU session 18: long-stream tile-size sweep for the chunked decode.

Session 4 measured the 64 MiB tile kernel at 10.45 GB/s vs 18.2 GB/s for
the 8 MiB headline — the tile itself is on the wrong side of a
working-set cliff (intermediates are ~16x the output bytes). Sweeps the
contiguous chunk kernel (with state carry, exactly what decompress uses
for long streams) at 4/8/16/32/64 MiB output tiles to pick
decoder.CHUNK_OUT_BYTES. Per-dispatch relay latency (~60 ms) bounds how
small tiles can usefully get host-side: also prints the implied
dispatches/GiB.

Run detached:  nohup python -u tools/tpu_session18.py > /tmp/tpu_session18.log 2>&1 &
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
    D = 64
    mibs = (1, 2) if SMOKE else (4, 8, 16, 32, 64)
    max_mib = mibs[-1]
    nrows = (max_mib << 20) // D
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    s = encoder.compress(raw.reshape(-1), D, codec="delta", elem_sz=1)
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, D, 1, lowdim=False)
    dense = decoder.gather_payloads(s, idx, D, 1, False)
    assert idx.total_rows == idx.widths.shape[0] * 8, "need run-free"

    for mib in mibs:
        tile_rows = (mib << 20) // D
        tile_nb = next_bucket(tile_rows // 8)
        dj = jnp.asarray(pad_rows(dense[:tile_nb], tile_nb))
        wj = jnp.asarray(pad_rows(idx.widths[:tile_nb], tile_nb))
        st = jnp.zeros((3, D), jnp.int32)

        def kern(d, w, s0):
            vals, s1 = decoder._decode_pass_contiguous_chunk.__wrapped__(
                d, w, s0, "delta", 1, False)
            return vals, s1

        got, _ = jax.jit(kern)(dj, wj, st)
        nr = min(tile_nb * 8, nrows)
        ok = np.array_equal(np.asarray(got)[:nr].astype(np.int64),
                            raw[:nr].astype(np.int64))
        if SMOKE:
            print(f"tile {mib:3d} MiB: exact={ok} (smoke)", flush=True)
            assert ok, mib
            continue
        t = devloop_time(kern, (dj, wj, st), 8)
        out_b = tile_nb * 8 * D
        print(f"tile {mib:3d} MiB chunk kernel  exact={ok}  "
              f"{t * 1e6:9.1f} us  {out_b / t / 1e9:6.2f} GB/s  "
              f"({(1 << 30) // out_b} dispatches/GiB)", flush=True)

    print("SESSION18 DONE", flush=True)


if __name__ == "__main__":
    main()
