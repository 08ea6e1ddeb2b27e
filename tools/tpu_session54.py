"""TPU session 54: encode-kernel param layout A/B (u8 rows vs i32).

The bench's encode row passed rows as int32 since round 2; production
compress() passes the NARROW u8 array and the pass widens on device
(encoder.py:261). Same measurement bug session 45b fixed for the
xff-batch row (there worth 4.7x). A/B both layouts; also u16 (narrow
u16 vs i32) and the xff-par widths param (i32 -> u8, checkpoint.py).

Run:  timeout 3600 python -u tools/tpu_session54.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import encoder

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(54)

    for elem_sz in (1, 2):
        eb = 8 * elem_sz
        dt = np.uint8 if elem_sz == 1 else np.uint16
        nr = (1 << 23) // elem_sz // 64
        raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
               % (1 << eb)).astype(dt)
        narrow_j = jnp.asarray(raw)
        wide_j = jnp.asarray(raw.astype(np.int32))

        def kern(r, elem_sz=elem_sz):
            return encoder._encode_pass.__wrapped__(
                r, "delta", elem_sz, False)

        a = jax.jit(kern)(narrow_j)
        b = jax.jit(kern)(wide_j)
        ok = all(bool(jax.jit(jnp.array_equal)(x, y)) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))
        print(f"-- u{eb} d64 encode, outputs identical: {ok}", flush=True)
        for rep in range(2):
            for name, rows in (("narrow", narrow_j), ("i32", wide_j)):
                t = devloop_time(kern, (rows,), 16)
                print(f"  u{eb} encode {name}: "
                      f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    print("SESSION54 DONE", flush=True)


if __name__ == "__main__":
    main()
