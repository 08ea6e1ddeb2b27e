"""TPU session 16: grouped lowdim ENCODE A/B (dmajor vs grouped vs legacy).

Sessions 9-11: dmajor (dynshift) encode won 1.9x over legacy
(2.32-2.37 vs 1.20-1.25 GB/s) but is still ~30x under the chip's
elementwise rate. Sessions 12/13 showed the grouped full-tile layout is
the winning decode formulation; _encode_lowdim_grouped applies it to
encode (one u32 word per row, G=128/D blocks folded, pack via the
batched einsum on (c, 8, ~128)). This session A/Bs all three encode
passes on device for d4u8 / d2u16 / d1u8 / d1u16.

Run detached:  nohup python -u tools/tpu_session16.py > /tmp/tpu_session16.log 2>&1 &
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
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)
    nrl = 1 << 13 if SMOKE else 1 << 20

    for D, esz, tag in ((4, 1, "d4 u8"), (2, 2, "d2 u16"), (1, 1, "d1 u8"),
                        (1, 2, "d1 u16")):
        lim = 6 if esz == 1 else 300
        dt = np.uint8 if esz == 1 else np.uint16
        raw = (np.cumsum(rng.integers(-lim, lim + 1, (nrl, D)), axis=0)
               % (1 << (8 * esz))).astype(dt)
        nb_pad = next_bucket(nrl // 8)
        rows = jnp.asarray(
            pad_rows(raw.astype(np.int32), nb_pad * 8))

        def kern(r, esz=esz):
            return encoder._encode_pass.__wrapped__(r, "delta", esz, True)

        ref = None
        for name in ("legacy", "dmajor", "grouped"):
            encoder.LOWDIM_ENCODE = name
            jax.clear_caches()
            w, h, d, ws = jax.jit(kern)(rows)
            got = (np.asarray(w).astype(np.int64),
                   np.asarray(h).astype(np.int64),
                   np.asarray(d), np.asarray(ws).astype(np.int64))
            if ref is None:
                ref = got
                ok = True
            else:
                ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
            if SMOKE:
                print(f"encode {tag} [{name}]: exact={ok} (smoke)",
                      flush=True)
                assert ok, (tag, name)
                continue
            t = devloop_time(kern, (rows,), 16)
            print(f"encode {tag} lowdim pass [{name:7s}]  exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)

    print("SESSION16 DONE", flush=True)


if __name__ == "__main__":
    main()
