"""TPU session 25: throughput-vs-ndims curve (VERDICT r3 item 9).

Reproduces the shape study of the paper (communicate/results.tex:156-180):
decode + encode kernel throughput for d in {1,2,3,4,5,8,16,32,64,128},
u8 and u16, on contiguous cumsum streams (~8 MiB each). The paper's
curve rises toward multiples of 32 (8b) / 16 (16b) dims and dips at the
lowdim->rowmajor dispatch switch (after d4 u8 / d2 u16).

Run:  timeout 5400 python -u tools/tpu_session25.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"
NDIMS = [1, 2, 3, 4, 5, 8, 16, 32, 64, 128]


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

    rng = np.random.default_rng(4)
    iters = 2 if SMOKE else 16
    total = 1 << (16 if SMOKE else 23)  # ~8 MiB per config

    print(f"{'d':>4} {'dtype':>5} {'layout':>8} {'decode':>9} {'encode':>9}",
          flush=True)
    for esz in (1, 2):
        dt = np.uint8 if esz == 1 else np.uint16
        for d in (NDIMS if not SMOKE else [2, 5]):
            nr = (total // esz) // d // 8 * 8
            r = (np.cumsum(rng.integers(-6, 7, (nr, d)), axis=0)
                 % (1 << (8 * esz))).astype(dt)
            lowdim = d <= LOWDIM_MAX_NDIMS[esz]
            s = encoder.compress(r.reshape(-1), d, codec="delta")
            ng, _, _ = read_metadata_rle(s)
            idx = decoder.walk_headers(s, ng, d, esz, lowdim=lowdim)
            if idx.total_rows != idx.widths.shape[0] * 8:
                print(f"{d:>4} u{8*esz:<4} stream has runs, skip", flush=True)
                continue
            dd = decoder.gather_payloads(s, idx, d, esz, lowdim)
            nd_pad = next_bucket(dd.shape[0])
            dj = jnp.asarray(pad_rows(dd, nd_pad))
            wj = jnp.asarray(pad_rows(idx.widths, nd_pad))

            def kern(a, b):
                return decoder._decode_pass_contiguous.__wrapped__(
                    a, b, "delta", esz, lowdim)

            out = np.asarray(kern(dj, wj))[: idx.total_rows]
            ok = np.array_equal(out.reshape(-1),
                                r.reshape(-1)[: out.size])
            t = devloop_time(kern, (dj, wj), iters)
            rows_j = jnp.asarray(pad_rows(r.astype(np.int32),
                                          nd_pad * 8))

            def ekern(rr):
                return encoder._encode_pass.__wrapped__(
                    rr, "delta", esz, lowdim)

            te = devloop_time(ekern, (rows_j,), iters)
            lay = "lowdim" if lowdim else "rowmajor"
            print(f"{d:>4} u{8*esz:<4} {lay:>8} "
                  f"{r.nbytes / t / 1e9:8.2f}G {r.nbytes / te / 1e9:8.2f}G"
                  f"  exact={ok}", flush=True)

    print("SESSION25 DONE", flush=True)


if __name__ == "__main__":
    main()
