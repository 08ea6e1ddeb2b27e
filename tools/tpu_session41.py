"""TPU session 41: is the (N, D<=4) INPUT PARAM layout the encode floor?

Session 40: d3 encode front-end 0.85 GB/s and the flat-math rewrite
0.75 — both consume the same (N, 3) u8 jit parameter, whose physical
layout pads the 3-lane minor to a full tile (~42x). Here the SAME flat
math takes a genuinely flat (N*D,) u8 parameter, so no padded N-scale
tensor exists anywhere:
  front2d  - baseline: (N, D) param, production front-end
  frontfl  - flat (N*D,) param, flat lane-shift front-end -> (nb, D)
  fullfl   - flat param, front + widths + hdr + grouped jpack

Run:  timeout 4800 python -u tools/tpu_session41.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"


def _eq(a, b) -> bool:
    import jax
    import jax.numpy as jnp

    return bool(jax.jit(jnp.array_equal)(a, b))


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu.constants import BLOCK_SZ
    from sprintz_tpu.models.forecasters import delta_encode
    from sprintz_tpu.ops.bitmath import block_widths_lowdim, header_value

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(41)
    iters = 2 if SMOKE else 16
    for D, esz in ([(3, 1)] if SMOKE else [(3, 1), (4, 1)]):
        eb = 8 * esz
        mask = (1 << eb) - 1
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = (1 << (12 if SMOKE else 23)) // esz // D
        nrows -= nrows % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
               % (1 << eb)).astype(dt)
        rows2d = jnp.asarray(raw)
        flat_j = jnp.asarray(raw.reshape(-1))  # FLAT param
        nb = nrows // BLOCK_SZ
        nbytes = raw.nbytes
        print(f"-- d{D} u{8*esz}: {nrows} rows", flush=True)

        def front2d(r):
            errs = delta_encode(r.astype(jnp.int32), eb)
            return jnp.bitwise_or.reduce(
                errs.reshape(nb, BLOCK_SZ, D), axis=1)

        def _flat_zz(f):
            x = f.astype(jnp.int32)
            prev = jnp.pad(x, (D, 0))[: x.shape[0]]
            d = (x - prev) & mask
            half = 1 << (eb - 1)
            ds = d - ((d & half) << 1)
            return ((ds << 1) ^ (ds >> 31)) & mask  # flat zigzag errs

        def frontfl(f):
            zz = _flat_zz(f)
            return jnp.bitwise_or.reduce(
                zz.reshape(nb, BLOCK_SZ, D), axis=1)

        def fullfl(f):
            zz = _flat_zz(f)
            orm = jnp.bitwise_or.reduce(
                zz.reshape(nb, BLOCK_SZ, D), axis=1)
            w = block_widths_lowdim(orm, esz)
            hdr = header_value(w, eb)
            from sprintz_tpu.ops.pack import pack_dims_lowdim_grouped

            dense = pack_dims_lowdim_grouped(
                zz.reshape(nb, BLOCK_SZ, D), w, esz)
            return w, hdr, dense, w.sum(axis=1)

        a = jax.jit(front2d)(rows2d)
        a.block_until_ready()
        print("  front2d ran", flush=True)
        b = jax.jit(frontfl)(flat_j)
        print(f"  frontfl exact: {_eq(a, b)}", flush=True)

        for rep in range(2):
            for name, fn, args in [("front2d", front2d, (rows2d,)),
                                   ("frontfl", frontfl, (flat_j,)),
                                   ("fullfl", fullfl, (flat_j,))]:
                try:
                    t = devloop_time(fn, args, iters)
                    print(f"  d{D} {name:>8}: {nbytes / t / 1e9:6.2f} GB/s",
                          flush=True)
                except Exception as e:
                    print(f"  d{D} {name:>8}: DIED {type(e).__name__} "
                          f"{str(e)[:70]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)
    print("SESSION41 DONE", flush=True)


if __name__ == "__main__":
    main()
