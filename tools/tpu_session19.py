"""TPU session 19: xff sidecar chunk-count sweep.

The chunk-parallel FIRE decode (checkpoint.decompress_parallel) runs the
serial block scan at C*D lanes over nb/C blocks: more chunks = shorter
scan but more padding + bigger gather/state tensors. Session 2 measured
11.66 GB/s at C=128 (every_groups=64 on 8 MiB); this sweeps
every_groups in {256,128,64,32,16} -> C in {32..512} at 8 MiB and
{128,64,32} at 32 MiB to pick the compress_seekable default.

Run detached:  nohup python -u tools/tpu_session19.py > /tmp/tpu_session19.log 2>&1 &
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
    from sprintz_tpu.utils.shapes import next_bucket

    rng = np.random.default_rng(0)
    D = 64

    def sweep(mib, every_list):
        nrows = (mib << 20) // D
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
               % 256).astype(np.uint8)
        for every in every_list:
            s2, sc = checkpoint.compress_with_sidecar(
                raw.reshape(-1), D, codec="xff", every_groups=every)
            # full-path exactness via the production parallel decode
            out = checkpoint.decompress_parallel(s2, sc)
            ok = np.array_equal(out, raw.reshape(-1))

            ng2, _, _ = read_metadata_rle(s2)
            idx2 = decoder.walk_headers(s2, ng2, D, 1, lowdim=False)
            d2 = decoder.gather_payloads(s2, idx2, D, 1, False)
            if idx2.total_rows != idx2.widths.shape[0] * 8:
                print(f"  every={every}: runs present, skip", flush=True)
                continue
            C = len(sc.byte_offsets)
            cob = (np.searchsorted(sc.byte_offsets, idx2.payload_offsets,
                                   side="right") - 1)
            counts = np.bincount(cob, minlength=C)
            nb_pad = next_bucket(int(counts.max()))
            dense_c = np.zeros((C, nb_pad) + d2.shape[1:], np.uint8)
            widths_c = np.zeros((C, nb_pad, D), np.int32)
            order = np.argsort(cob, kind="stable")
            starts = np.concatenate([[0], np.cumsum(counts)])
            for c in range(C):
                seg = order[starts[c]: starts[c + 1]]
                dense_c[c, : len(seg)] = d2[seg]
                widths_c[c, : len(seg)] = idx2.widths[seg]
            states = np.zeros((C, 3, D), np.int32)
            states[:, : sc.states.shape[1]] = sc.states
            lr = jnp.zeros((C, nb_pad), jnp.int32)

            def kern(d, w, s, lr=lr, nb_pad=nb_pad):
                return decoder._decode_pass_chunks.__wrapped__(
                    d, w, lr, s, "xff", 1, False, nb_pad * 8, True)

            if SMOKE:
                print(f"  {mib} MiB every={every} C={C}: exact={ok} (smoke)",
                      flush=True)
                assert ok, every
                continue
            t2 = devloop_time(
                kern, (jnp.asarray(dense_c), jnp.asarray(widths_c),
                       jnp.asarray(states)), 16)
            print(f"  {mib:3d} MiB every={every:4d} C={C:4d} nb_pad={nb_pad:5d}"
                  f"  exact={ok}  {t2 * 1e6:9.1f} us  "
                  f"{raw.nbytes / t2 / 1e9:6.2f} GB/s", flush=True)

    if SMOKE:
        sweep(1, (64, 16))
    else:
        print("xff-par chunk sweep, 8 MiB:", flush=True)
        sweep(8, (256, 128, 64, 32, 16))
        print("xff-par chunk sweep, 32 MiB:", flush=True)
        sweep(32, (128, 64, 32))

    print("SESSION19 DONE", flush=True)


if __name__ == "__main__":
    main()
