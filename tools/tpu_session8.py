"""TPU session 8: device A/B of the dim-major lowdim ENCODE pass.

Session-6 baseline: lowdim encode pass 0.65 GB/s for every formulation
and both dtypes (the (N, D<=4)-minor layout runs 4 of 128 VPU lanes).
The dmajor pass keeps the sample axis minor end to end; streams are
byte-identical (CPU-verified vs legacy and the oracle).

Grid (pure XLA, no fault risk):
  1. encode pass d4 u8 / d2 u16 / d1 u8: legacy vs dmajor
     (byte-identity of (widths, dense) checked against legacy on device)

Run detached:  nohup python -u tools/tpu_session8.py > /tmp/tpu_session8.log 2>&1 &
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

    rng = np.random.default_rng(0)
    nrl = 1 << 13 if SMOKE else 1 << 20
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    rawl1 = (np.cumsum(rng.integers(-6, 7, (nrl, 1)), axis=0) % 256
             ).astype(np.uint8)

    def run(tag, raw, elem_sz):
        rows = jnp.asarray(raw)

        def kern(r):
            w, h, d, s = encoder._encode_pass.__wrapped__(
                r, "delta", elem_sz, True)
            return w.astype(jnp.int32), h.astype(jnp.int32), d, s

        outs = {}
        for flag, name in ((False, "legacy"), (True, "dmajor")):
            encoder.LOWDIM_DMAJOR = flag
            jax.clear_caches()
            outs[name] = [np.asarray(o) for o in jax.jit(kern)(rows)]
            ok = all(np.array_equal(a, b) for a, b in
                     zip(outs["legacy"], outs[name]))
            if SMOKE:
                print(f"{tag} [{name}]: exact={ok} (smoke)", flush=True)
                assert ok
                continue
            t = devloop_time(kern, (rows,), 16)
            print(f"{tag} [{name}]  exact={ok}  {t * 1e6:9.1f} us  "
                  f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    run("lowdim encode pass d4 u8", rawl8, 1)
    run("lowdim encode pass d2 u16", rawl16, 2)
    run("lowdim encode pass d1 u8", rawl1, 1)

    encoder.LOWDIM_DMAJOR = True
    print("SESSION8 DONE", flush=True)


if __name__ == "__main__":
    main()
