"""TPU session 33: batched multi-stream decode at small ndims.

The ndims curve (sessions 25/27) dips at small d — one stream of d<=4
starves the 128-lane VPU/MXU. decompress_batch vmaps the contiguous
pass over S streams (FIRE runs S*D lanes wide) — this measures how much
of the headline rate the batch axis recovers for fleets of small
streams (the many-sensors deployment shape the reference paper
targets). 64 streams x 128 KiB = 8 MiB per config.

Run:  timeout 5400 python -u tools/tpu_session33.py
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
    from sprintz_tpu.utils.shapes import next_bucket

    rng = np.random.default_rng(13)
    iters = 2 if SMOKE else 16
    S = 8 if SMOKE else 64
    per_stream = 1 << (10 if SMOKE else 17)  # bytes per stream

    grid = ([(1, 1, "delta")] if SMOKE else
            [(1, 1, "delta"), (1, 4, "delta"), (2, 2, "delta"),
             (1, 4, "xff"), (1, 64, "xff")])
    for esz, d, codec in grid:
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = per_stream // esz // d // 8 * 8
        lowdim = d <= LOWDIM_MAX_NDIMS[esz]
        bufs, raws, idxs, denses = [], [], [], []
        for _ in range(S):
            r = (np.cumsum(rng.integers(-6, 7, (nrows, d)), axis=0)
                 % (1 << (8 * esz))).astype(dt)
            s = encoder.compress(r.reshape(-1), d, codec=codec,
                                 elem_sz=esz)
            ng, _, _ = read_metadata_rle(s)
            idx = decoder.walk_headers(s, ng, d, esz, lowdim=lowdim)
            if idx.total_rows != idx.widths.shape[0] * 8:
                continue
            raws.append(r)
            bufs.append(s)
            idxs.append(idx)
            denses.append(decoder.gather_payloads(s, idx, d, esz, lowdim))
        if not bufs:
            print(f"{codec} u{8*esz} d{d}: streams all have runs, skip",
                  flush=True)
            continue
        Sb = len(bufs)
        nd_pad = next_bucket(max(dd.shape[0] for dd in denses))
        maxb = max(dd.shape[2] for dd in denses)
        dense_b = np.zeros((Sb, nd_pad, denses[0].shape[1], maxb),
                           np.uint8)
        widths_b = np.zeros((Sb, nd_pad, d), np.int32)
        for i, dd in enumerate(denses):
            dense_b[i, : dd.shape[0], :, : dd.shape[2]] = dd
            widths_b[i, : dd.shape[0]] = idxs[i].widths
        args = (jnp.asarray(dense_b), jnp.asarray(widths_b))

        def kern(dn, w):
            return decoder._decode_pass_contiguous_batch.__wrapped__(
                dn, w, codec, esz, lowdim)

        vals = np.asarray(kern(*args))
        ok = all(
            np.array_equal(
                vals[i, : idxs[i].total_rows].reshape(-1),
                raws[i].reshape(-1)[: idxs[i].total_rows * d])
            for i in range(Sb))
        nbytes = sum(r.nbytes for r in raws)
        t = devloop_time(kern, args, iters)
        print(f"{codec} u{8*esz} d{d:3d} batch S={Sb:3d}: "
              f"{nbytes / t / 1e9:6.2f} GB/s exact={ok}", flush=True)

    print("SESSION33 DONE", flush=True)


if __name__ == "__main__":
    main()
