"""TPU session 36: block-folded rowmajor delta decode A/B.

Folds G = 128/D consecutive blocks into one 128-lane virtual block so
the unpack output, zigzag, and prefix all run full-lane (session-34
diagnosis: at D < 128 every D-minor bf16/i32 tensor pads its lane dim,
so e.g. the D=64 headline moves ~2x its logical bytes — consistent with
d128 measuring 22.4 vs d64's 18.1 on the same byte count). Exact cross-
chain prefix fixup; delta only. Interleaved ABAB x2 per D.

Run:  timeout 5400 python -u tools/tpu_session36.py
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

    rng = np.random.default_rng(6)
    iters = 2 if SMOKE else 16
    total = 1 << (16 if SMOKE else 23)

    grid = ([(1, 16)] if SMOKE else
            [(1, 64), (1, 32), (1, 16), (1, 8), (2, 64), (2, 16)])
    prev = decoder.ROWMAJOR_FOLD
    try:
        for esz, D in grid:
            dt = np.uint8 if esz == 1 else np.uint16
            nrows = (total // esz) // D // 8 * 8
            raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
                   % (1 << (8 * esz))).astype(dt)
            s = encoder.compress(raw.reshape(-1), D, codec="delta",
                                 elem_sz=esz)
            ng, _, _ = read_metadata_rle(s)
            idx = decoder.walk_headers(s, ng, D, esz, lowdim=False)
            if idx.total_rows != idx.widths.shape[0] * 8:
                print(f"u{8*esz} d{D}: runs, skip", flush=True)
                continue
            dense = decoder.gather_payloads(s, idx, D, esz, False)
            nd_pad = next_bucket(dense.shape[0])
            dj = jnp.asarray(pad_rows(dense, nd_pad))
            wj = jnp.asarray(pad_rows(idx.widths, nd_pad))

            def kern(d, w):
                return decoder._decode_pass_contiguous.__wrapped__(
                    d, w, "delta", esz, False)

            for rep in range(2):
                for flag in (False, True):
                    decoder.ROWMAJOR_FOLD = flag
                    if rep == 0:
                        out = np.asarray(kern(dj, wj))[: idx.total_rows]
                        ok = np.array_equal(out.reshape(-1),
                                            raw.reshape(-1)[: out.size])
                        if not ok:
                            print(f"u{8*esz} d{D} fold={int(flag)}: "
                                  f"NOT EXACT", flush=True)
                            continue
                    t = devloop_time(kern, (dj, wj), iters)
                    print(f"u{8*esz} d{D:3d} fold={int(flag)} rep{rep}: "
                          f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    finally:
        decoder.ROWMAJOR_FOLD = prev

    print("SESSION36 DONE", flush=True)


if __name__ == "__main__":
    main()
