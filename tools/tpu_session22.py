"""TPU session 22: FIRE forecast transform in isolation.

BASELINE.md row "FIRE forecast transform alone (errors<->samples,
size-preserving)": the reference measures 5 GB/s encode / 6 GB/s decode
single-thread (communicate/results.tex:186-193, memcpy = 7.5 GB/s).
Every number so far wraps the transform inside the full decode pass;
this measures the transform itself:

1. fire_decode serial scan (whole-stream recurrence), u8/u16 d64.
2. fire_decode chunk-parallel: vmap over C chunks entering at exact
   states from fire_encode_with_states (the sidecar mechanism without
   the stream machinery), C in {64, 128, 256}; exactness vs serial.
3. fire_encode (encode-side transform), u8/u16 d64.

Rates are in transform bytes (N * D * elem_sz — size-preserving, the
reference's convention).

Run detached:  nohup python -u tools/tpu_session22.py > /tmp/tpu_session22.log 2>&1 &
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
    from sprintz_tpu.models.forecasters import (
        fire_decode,
        fire_encode,
        fire_encode_with_states,
    )

    rng = np.random.default_rng(0)
    D = 64
    iters = 4 if SMOKE else 16

    for elem_sz in (1, 2):
        eb = 8 * elem_sz
        hi = 1 << eb
        nrows = 1 << (12 if SMOKE else (17 if elem_sz == 1 else 16))
        nbytes = nrows * D * elem_sz
        raw = (np.cumsum(rng.integers(-6 * elem_sz, 6 * elem_sz + 1,
                                      (nrows, D)), axis=0) % hi
               ).astype(np.int32)
        rows_j = jnp.asarray(raw)

        # encode transform (values -> zigzag errors)
        ej = jax.jit(lambda r: fire_encode(r, eb))
        errs = np.asarray(jax.block_until_ready(ej(rows_j)))
        if not SMOKE:
            t = devloop_time(lambda r: fire_encode(r, eb), (rows_j,), iters)
            print(f"  fire_encode u{eb} d{D}: {t * 1e6:9.1f} us  "
                  f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

        # serial decode transform
        errs_j = jnp.asarray(errs)
        dj = jax.jit(lambda e: fire_decode(e, eb))
        out = np.asarray(jax.block_until_ready(dj(errs_j)))
        ok = np.array_equal(out & (hi - 1), raw)
        print(f"  fire_decode u{eb} serial: exact={ok}", flush=True)
        assert ok
        if not SMOKE:
            t = devloop_time(lambda e: fire_decode(e, eb), (errs_j,), iters)
            print(f"  fire_decode u{eb} d{D} serial: {t * 1e6:9.1f} us  "
                  f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

        # chunk-parallel decode via exact per-chunk entry states
        _, states = fire_encode_with_states(rows_j, eb)
        states = np.asarray(states)  # (nb, 3, D) carry BEFORE each block
        nb = nrows // 8
        for C in ((2,) if SMOKE else (64, 128, 256)):
            if nb % C:
                continue
            per = nb // C
            errs_c = jnp.asarray(errs.reshape(C, per * 8, D))
            st_c = jnp.asarray(states[::per])  # state entering each chunk

            def kern(e, s):
                return jax.vmap(
                    lambda ec, sc: fire_decode(ec, eb, init_state=sc)
                )(e, s)

            outc = np.asarray(jax.block_until_ready(
                jax.jit(kern)(errs_c, st_c))).reshape(nrows, D)
            okc = np.array_equal(outc & (hi - 1), raw)
            if SMOKE:
                print(f"  fire_decode u{eb} C={C}: exact={okc} (smoke)",
                      flush=True)
                assert okc, C
                continue
            t = devloop_time(kern, (errs_c, st_c), iters)
            print(f"  fire_decode u{eb} d{D} chunk-par C={C:3d}: "
                  f"exact={okc}  {t * 1e6:9.1f} us  "
                  f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

    print("SESSION22 DONE", flush=True)


if __name__ == "__main__":
    main()
