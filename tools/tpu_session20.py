"""TPU session 20: decode throughput vs dimensionality.

The paper's fig (communicate/results.tex:156-180) reports speed rising
with ndims (peaks near 32-B vector multiples, lowdim dip below 5 dims).
This measures the TPU analogue: contiguous delta decode kernel across
ndims at fixed 8 MiB input, u8 {1..4 lowdim, 8..256 rowmajor} and
u16 {1,2 lowdim, 8..128 rowmajor}.

Run detached:  nohup python -u tools/tpu_session20.py > /tmp/tpu_session20.log 2>&1 &
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
    from sprintz_tpu.constants import LOWDIM_MAX_NDIMS
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)
    mib = 1 if SMOKE else 8

    def one(D, esz):
        lowdim = D <= LOWDIM_MAX_NDIMS[esz]
        dt = np.uint8 if esz == 1 else np.uint16
        lim = 6 if esz == 1 else 300
        nrows = (mib << 20) // (D * esz)
        raw = (np.cumsum(rng.integers(-lim, lim + 1, (nrows, D)), axis=0)
               % (1 << (8 * esz))).astype(dt)
        s2 = encoder.compress(raw.reshape(-1), D, codec="delta")
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, D, esz, lowdim=lowdim)
        d2 = decoder.gather_payloads(s2, idx2, D, esz, lowdim)
        if idx2.total_rows != idx2.widths.shape[0] * 8:
            print(f"  d{D} u{8 * esz}: runs present, skip", flush=True)
            return
        nd2 = next_bucket(d2.shape[0])
        dj = jnp.asarray(pad_rows(d2, nd2))
        wj = jnp.asarray(pad_rows(idx2.widths, nd2))

        def kern(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, lowdim)

        # exactness once per config (same dispatch decompress uses)
        out = decoder.decompress(s2, codec="delta", elem_sz=esz)
        ok = np.array_equal(out, raw.reshape(-1))
        if SMOKE:
            print(f"  d{D} u{8 * esz}: exact={ok} (smoke)", flush=True)
            assert ok, (D, esz)
            return
        t2 = devloop_time(kern, (dj, wj), 16)
        print(f"  d{D:3d} u{8 * esz:2d} {'lowdim' if lowdim else 'rowmaj'}"
              f"  exact={ok}  {t2 * 1e6:9.1f} us  "
              f"{raw.nbytes / t2 / 1e9:6.2f} GB/s", flush=True)

    if SMOKE:
        for D, esz in ((2, 1), (8, 1), (2, 2), (8, 2)):
            one(D, esz)
    else:
        print("u8 dims sweep (8 MiB):", flush=True)
        for D in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            one(D, 1)
        print("u16 dims sweep (8 MiB):", flush=True)
        for D in (1, 2, 8, 16, 32, 64, 128):
            one(D, 2)

    print("SESSION20 DONE", flush=True)


if __name__ == "__main__":
    main()
