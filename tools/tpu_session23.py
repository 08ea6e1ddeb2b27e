"""TPU session 23: repeat A/B to settle the xff-par chunk-count default.

Session 19's single sweep was non-monotonic (8 MiB: C=128 10.7, C=256
7.4, C=512 18.7 GB/s) — inside the run-to-run variance STATUS.md warns
about. This measures every_groups in {64, 16} THREE times each,
interleaved (ABABAB) so drift cannot masquerade as a difference, at
8 MiB and 32 MiB u8 d64.

Run:  timeout 3000 python -u tools/tpu_session23.py
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

    rng = np.random.default_rng(7)
    D = 64
    iters = 2 if SMOKE else 32
    reps = 1 if SMOKE else 3

    def build(raw, every):
        # raw is shared between the A and B arms (same data, same widths,
        # same nb_pad) so the arms differ ONLY in chunking (ADVICE r2)
        s, sc = checkpoint.compress_with_sidecar(
            raw.reshape(-1), D, codec="xff", every_groups=every)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, 1, lowdim=False)
        d = decoder.gather_payloads(s, idx, D, 1, False)
        assert idx.total_rows == idx.widths.shape[0] * 8
        C = len(sc.byte_offsets)
        cob = (np.searchsorted(sc.byte_offsets, idx.payload_offsets,
                               side="right") - 1)
        counts = np.bincount(cob, minlength=C)
        nb_pad = next_bucket(int(counts.max()))
        dense_c = np.zeros((C, nb_pad) + d.shape[1:], np.uint8)
        widths_c = np.zeros((C, nb_pad, D), np.int32)
        order = np.argsort(cob, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])
        for c in range(C):
            seg = order[starts[c]: starts[c + 1]]
            dense_c[c, : len(seg)] = d[seg]
            widths_c[c, : len(seg)] = idx.widths[seg]
        states = np.zeros((C, 3, D), np.int32)
        states[:, : sc.states.shape[1]] = sc.states
        lr = jnp.zeros((C, nb_pad), jnp.int32)

        def kern(dd, ww, ss):
            return decoder._decode_pass_chunks.__wrapped__(
                dd, ww, lr, ss, "xff", 1, False, nb_pad * 8, True)

        # on-device exactness once per config
        out = np.asarray(kern(jnp.asarray(dense_c), jnp.asarray(widths_c),
                              jnp.asarray(states)))
        ok = np.array_equal(out.reshape(-1)[: raw.size], raw.reshape(-1))
        assert ok, (raw.shape, every)
        return (kern, (jnp.asarray(dense_c), jnp.asarray(widths_c),
                       jnp.asarray(states)), raw.nbytes, C, nb_pad)

    for nrows in ([1 << 12] if SMOKE else [1 << 17, 1 << 19]):
        mib = nrows * D >> 20
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
               ).astype(np.uint8)
        cfgs = {e: build(raw, e) for e in (64, 16)}
        print(f"{mib} MiB u8 d64 (interleaved reps):", flush=True)
        for rep in range(reps):
            for every, (kern, args, nbytes, C, nb_pad) in cfgs.items():
                t = devloop_time(kern, args, iters)
                print(f"  every={every:3d} C={C:4d} nb_pad={nb_pad:4d} "
                      f"rep{rep}: {t * 1e6:9.1f} us  "
                      f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

    print("SESSION23 DONE", flush=True)


if __name__ == "__main__":
    main()
