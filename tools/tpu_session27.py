"""TPU session 27: ndims-curve completion + lowdim xff sidecar decode.

Part A finishes the throughput-vs-ndims study session 25 started (it was
cut by a round restart after u8 d8): u8 d in {16,32,64,128} and the full
u16 half. Same methodology (contiguous cumsum streams ~8 MiB, kernel
devloop slope). Reproduces the paper's curve
(communicate/results.tex:156-180).

Part B measures the production fix for the lowdim-xff serial-scan wall
(session 24: 0.03 GB/s): sidecar chunk-parallel decode via
checkpoint._parallel_prep + decoder._decode_pass_chunks, d in {1,2,3,4}
u8 and {1,2} u16. VERDICT r3 item 3's bar: lowdim xff within 2x of
lowdim delta.

Run:  timeout 5400 python -u tools/tpu_session27.py
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
    from sprintz_tpu import checkpoint, decoder, encoder
    from sprintz_tpu.constants import LOWDIM_MAX_NDIMS
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(5)
    iters = 2 if SMOKE else 16
    total = 1 << (16 if SMOKE else 23)  # ~8 MiB per config

    # ---------------- Part A: ndims curve (remaining grid)
    grid = ([(1, d) for d in ([16, 32, 128] if not SMOKE else [16])]
            + [(2, d) for d in
               ([1, 2, 3, 4, 5, 8, 16, 32, 64, 128] if not SMOKE else [2])])
    print(f"{'d':>4} {'dtype':>5} {'layout':>8} {'decode':>9} {'encode':>9}",
          flush=True)
    for esz, d in grid:
        dt = np.uint8 if esz == 1 else np.uint16
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
        ok = np.array_equal(out.reshape(-1), r.reshape(-1)[: out.size])
        t = devloop_time(kern, (dj, wj), iters)
        rows_j = jnp.asarray(pad_rows(r.astype(np.int32), nd_pad * 8))

        def ekern(rr):
            return encoder._encode_pass.__wrapped__(rr, "delta", esz, lowdim)

        te = devloop_time(ekern, (rows_j,), iters)
        lay = "lowdim" if lowdim else "rowmajor"
        print(f"{d:>4} u{8*esz:<4} {lay:>8} "
              f"{r.nbytes / t / 1e9:8.2f}G {r.nbytes / te / 1e9:8.2f}G"
              f"  exact={ok}", flush=True)

    # ---------------- Part B: lowdim xff sidecar chunk-parallel decode
    print("--- lowdim xff-par (sidecar chunk-parallel) vs lowdim delta",
          flush=True)
    grid_b = ([(1, d) for d in ([1, 2, 3, 4] if not SMOKE else [2])]
              + [(2, d) for d in ([1, 2] if not SMOKE else [])])
    for esz, d in grid_b:
        dt = np.uint8 if esz == 1 else np.uint16
        nr = (total // esz) // d // 8 * 8
        r = (np.cumsum(rng.integers(-6, 7, (nr, d)), axis=0)
             % (1 << (8 * esz))).astype(dt)
        for codec in ("xff", "delta"):
            s, sc = checkpoint.compress_with_sidecar(
                r.reshape(-1), d, codec=codec, every_groups=16)
            prep = checkpoint._parallel_prep(s, sc)
            if prep is None:
                print(f"{d:>4} u{8*esz:<4} {codec}: prep degenerate, skip",
                      flush=True)
                continue
            C = prep.dense_c.shape[0]

            def kern(dc, wc, lr, st):
                return decoder._decode_pass_chunks.__wrapped__(
                    dc, wc, lr, st, codec, esz, prep.lowdim,
                    prep.rows_pad, prep.contiguous)

            args = (jnp.asarray(prep.dense_c), jnp.asarray(prep.widths_c),
                    jnp.asarray(prep.local_rows), jnp.asarray(prep.states))
            vals = np.asarray(kern(*args))
            body = np.concatenate(
                [vals[c, : prep.chunk_rows[c]] for c in range(C)])
            ok = np.array_equal(body.reshape(-1),
                                r.reshape(-1)[: body.size])
            t = devloop_time(kern, args, iters)
            print(f"{d:>4} u{8*esz:<4} {codec}-par C={C:4d}: "
                  f"{r.nbytes / t / 1e9:6.2f} GB/s exact={ok}", flush=True)

    print("SESSION27 DONE", flush=True)


if __name__ == "__main__":
    main()
