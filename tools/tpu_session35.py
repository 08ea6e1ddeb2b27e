"""TPU session 35: paired-dim PACK A/B (encode-side twin of session 34).

The pair window halves the encode one-hots ((c, D/2, MAXB) x 3
byte-lanes). Interleaved ABAB x2 on the delta u8 d64 encode kernel.

Run:  timeout 3600 python -u tools/tpu_session35.py
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
    from sprintz_tpu import encoder
    from sprintz_tpu.ops import pack

    rng = np.random.default_rng(6)
    D = 64
    nrows = 1 << (10 if SMOKE else 17)
    iters = 2 if SMOKE else 16

    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    rows_j = jnp.asarray(raw.astype(np.int32))
    nbytes = raw.nbytes

    def kern(r):
        return encoder._encode_pass.__wrapped__(r, "delta", 1, False)

    prev = pack.UNPACK_PAIR
    try:
        # byte-identity on device first
        streams = {}
        for flag in (False, True):
            pack.UNPACK_PAIR = flag
            streams[flag] = encoder.compress(raw.reshape(-1), D,
                                             codec="delta")
        print(f"encode pair byte-identical: "
              f"{streams[True] == streams[False]}", flush=True)
        for rep in range(2):
            for flag in (False, True):
                pack.UNPACK_PAIR = flag
                t = devloop_time(kern, (rows_j,), iters)
                print(f"encode pass pair={int(flag)} rep{rep}: "
                      f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)
    finally:
        pack.UNPACK_PAIR = prev

    print("SESSION35 DONE", flush=True)


if __name__ == "__main__":
    main()
