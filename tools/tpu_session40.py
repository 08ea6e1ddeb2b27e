"""TPU session 40: where do the 17 ms of a d3 encode pass go?

Every d3 encode formulation (legacy einsum, grouped, jsel pack) lands
at 0.49 GB/s (sessions 38/39) — a shared stage dominates. Isolate:
  front  - delta_encode + zigzag + reshape + or-reduce -> ormask
  flatf  - FLAT front-end prototype: the same math as lane-shifted
           ops on the (N*D,) flat array (632 GB/s-class shapes,
           session-11 cost map) -> exactness vs front + time
  widths - block_widths_lowdim + header_value + width sums from ormask
  packs  - pack_dims_lowdim (einsum) / grouped / jsel from blocks
  full   - whole _encode_pass reference point

Session-39 harness lessons applied: per-step prints, jitted on-device
equality only, narrow (u8) pushes, resilient per-variant loop.

Run:  timeout 4800 python -u tools/tpu_session40.py
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
    from sprintz_tpu import encoder
    from sprintz_tpu.constants import BLOCK_SZ
    from sprintz_tpu.ops import pack
    from sprintz_tpu.models.forecasters import delta_encode
    from sprintz_tpu.ops.bitmath import block_widths_lowdim, header_value

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(40)
    iters = 2 if SMOKE else 16
    for D, esz in ([(3, 1)] if SMOKE else [(3, 1), (4, 1)]):
        eb = 8 * esz
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = (1 << (12 if SMOKE else 23)) // esz // D
        nrows -= nrows % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
               % (1 << eb)).astype(dt)
        rows_u8 = jnp.asarray(raw)  # narrow push (prod layout)
        nb = nrows // BLOCK_SZ
        nbytes = raw.nbytes
        print(f"-- d{D} u{8*esz}: {nrows} rows, {nb} blocks", flush=True)

        def stage_front(r):
            rows = r.astype(jnp.int32)
            errs = delta_encode(rows, eb)
            blocks = errs.reshape(nb, BLOCK_SZ, D)
            return jnp.bitwise_or.reduce(blocks, axis=1)

        def stage_flatf(r):
            # flat-lane prototype: delta via a D-element shift of the
            # flat stream, zigzag on flat, or-reduce via (nb, 8*D)
            flat = r.reshape(-1).astype(jnp.int32)
            prev = jnp.pad(flat, (D, 0))[: flat.shape[0]]
            d = (flat - prev) & ((1 << eb) - 1)
            # zigzag on signed delta (sign_extend then zz) — flat ops
            half = 1 << (eb - 1)
            ds = d - ((d & half) << 1)  # sign-extend eb-bit
            zz = ((ds << 1) ^ (ds >> 31)) & ((1 << eb) - 1)
            return jnp.bitwise_or.reduce(
                zz.reshape(nb, BLOCK_SZ, D), axis=1)

        def stage_widths(orm):
            w = block_widths_lowdim(orm, esz)
            return w, header_value(w, eb), w.sum(axis=1)

        def stage_full(r):
            return encoder._encode_pass.__wrapped__(r, "delta", esz, True)

        # references + exactness (front vs flatf)
        a = jax.jit(stage_front)(rows_u8)
        a.block_until_ready()
        print("  front ran", flush=True)
        b = jax.jit(stage_flatf)(rows_u8)
        print(f"  flatf exact vs front: {_eq(a, b)}", flush=True)
        orm_j = a
        errs_full = jax.jit(lambda r: delta_encode(
            r.astype(jnp.int32), eb).reshape(nb, BLOCK_SZ, D))(rows_u8)
        w_j = jax.jit(lambda o: block_widths_lowdim(o, esz))(orm_j)
        jax.block_until_ready((errs_full, w_j))
        print("  refs ready", flush=True)

        variants = [
            ("front", stage_front, (rows_u8,)),
            ("flatf", stage_flatf, (rows_u8,)),
            ("widths+hdr", stage_widths, (orm_j,)),
            ("pack einsum", lambda e, w: pack.pack_dims_lowdim(
                e, w, esz), (errs_full, w_j)),
            ("pack grouped", lambda e, w: pack.pack_dims_lowdim_grouped(
                e, w, esz), (errs_full, w_j)),
            ("full pass", stage_full, (rows_u8,)),
        ]
        for rep in range(2):
            for name, fn, args in variants:
                try:
                    t = devloop_time(fn, args, iters)
                    print(f"  d{D} {name:>12}: {nbytes / t / 1e9:6.2f} GB/s",
                          flush=True)
                except Exception as e:
                    print(f"  d{D} {name:>12}: DIED {type(e).__name__} "
                          f"{str(e)[:70]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)
                    print("  (device probe ok)", flush=True)
    print("SESSION40 DONE", flush=True)


if __name__ == "__main__":
    main()
