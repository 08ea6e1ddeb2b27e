"""TPU session 10: micro-probe of tile-padding costs by array shape.

Maps the empirical cost rules for elementwise work on this stack: TPU
tiles are (8 sublanes, 128 lanes) — a minor dim < 128 or a second-minor
dim < 8 should pad, multiplying traffic. The lowdim dmajor design picks
layouts by these rules, so measure them directly: the SAME 10-op int32
elementwise chain over 16M elements at different shapes.

Run detached:  nohup python -u tools/tpu_session10.py > /tmp/tpu_session10.log 2>&1 &
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

    n = 1 << 18 if SMOKE else 1 << 24  # elements
    nbytes = n * 4
    base = np.arange(n, dtype=np.int32)

    def chain(x):
        # 10 elementwise ops, dependency-chained so none can be elided
        for k in range(5):
            x = (x >> 1) ^ (x + k)
            x = jnp.where((x & 7) == k, x + 1, x)
        return x

    shapes = [
        (n,), (1, n), (2, n // 2), (4, n // 4), (8, n // 8),
        (32, n // 32), (256, n // 256),
        (n // 4, 4), (n // 8, 8), (n // 128, 128),
        (4, n // 32, 8), (4, 8, n // 32), (8, 4, n // 32),
    ]
    for shp in shapes:
        x = jnp.asarray(base.reshape(shp))
        if SMOKE:
            jax.block_until_ready(jax.jit(chain)(x))
            print(f"{str(shp):20s} ok (smoke)", flush=True)
            continue
        t = devloop_time(chain, (x,), 32, chain=True)
        print(f"{str(shp):20s} {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:7.2f} GB/s-equiv", flush=True)

    # transposes between the layouts the dmajor passes use
    for a, b in (((1 << 17, 8), None), ((8, 1 << 17), None),
                 ((1 << 17, 2), None), ((1 << 15, 128), None)):
        x = jnp.asarray(np.arange(a[0] * a[1], dtype=np.int32).reshape(a))

        def tr(x):
            return jnp.swapaxes(x, -1, -2) + 1

        if SMOKE:
            jax.block_until_ready(jax.jit(tr)(x))
            print(f"transpose {a} ok (smoke)", flush=True)
            continue
        t = devloop_time(tr, (x,), 32)
        print(f"transpose {str(a):14s} {t * 1e6:9.1f} us  "
              f"{x.nbytes / t / 1e9:7.2f} GB/s", flush=True)

    print("SESSION10 DONE", flush=True)


if __name__ == "__main__":
    main()
