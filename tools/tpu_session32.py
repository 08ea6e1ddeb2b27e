"""TPU session 32: xff-par sidecar chunk-count, every_groups 8 vs 16.

Session 23 adjudicated 16 over 64 (18.6 vs 10.7 GB/s at 8 MiB u8). The
trend pointed smaller-is-faster; 8 doubles the lane count again
(sidecar overhead 1.8% of an 8 MiB u8 stream). Also re-measures u16 at
16/8 (session 21's 25.1 GB/s was at every=64). Interleaved ABAB x2.

Run:  timeout 5400 python -u tools/tpu_session32.py
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
    from sprintz_tpu import checkpoint, decoder
    from sprintz_tpu.golden.stream import read_metadata_rle

    rng = np.random.default_rng(12)
    D = 64
    iters = 2 if SMOKE else 16

    for esz in ([1] if SMOKE else [1, 2]):
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = (1 << (13 if SMOKE else 23)) // esz // D
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
               % (1 << (8 * esz))).astype(dt)
        cfgs = {}
        for every in ([1] if SMOKE else [8, 16]):
            s, sc = checkpoint.compress_with_sidecar(
                raw.reshape(-1), D, codec="xff", every_groups=every)
            prep = checkpoint._parallel_prep(s, sc)
            C = prep.dense_c.shape[0]
            args = (jnp.asarray(prep.dense_c), jnp.asarray(prep.widths_c),
                    jnp.asarray(prep.local_rows), jnp.asarray(prep.states))

            def kern(dc, wc, lr, st, prep=prep):
                return decoder._decode_pass_chunks.__wrapped__(
                    dc, wc, lr, st, "xff", esz, prep.lowdim,
                    prep.rows_pad, prep.contiguous)

            vals = np.asarray(kern(*args))
            body = np.concatenate(
                [vals[c, : prep.chunk_rows[c]] for c in range(C)])
            ok = np.array_equal(body.reshape(-1),
                                raw.reshape(-1)[: body.size])
            oh = len(sc.to_bytes()) / len(s)
            print(f"u{8*esz} every={every:3d} C={C:5d}: exact={ok} "
                  f"sidecar +{oh*100:.1f}%", flush=True)
            cfgs[every] = (kern, args)
        for rep in range(2):
            for every, (kern, args) in cfgs.items():
                t = devloop_time(kern, args, iters)
                print(f"u{8*esz} every={every:3d} rep{rep}: "
                      f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    print("SESSION32 DONE", flush=True)


if __name__ == "__main__":
    main()
