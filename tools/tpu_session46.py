"""TPU session 46: matmul-free wordsel unpack A/B (headline item 1).

Session 42 isolated the flat d64 u8 pass: unpack 294 us (the wall) vs
prefix 168 us, and sessions 28/30/34 showed the one-hot weight BUILD
(not the dot, not HBM) limits the unpack. wordsel removes the matmul:
bitcast rows to u32 words, select each field's <= 2 words (W32-deep
where chain), funnel-shift — ~2x fewer build-side elementwise ops.

Measures (flat params, production _CHUNK=16384):
  u8 d64:  full pass + isolated unpack, transpose vs wordsel
  u16 d64: full pass, transpose vs wordsel
  u8 d16 / d32: full pass, transpose vs wordsel (smaller maxb)

Run:  timeout 5400 python -u tools/tpu_session46.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session46.py
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
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(46)
    iters = 2 if SMOKE else 32
    cells = [(64, 1, True), (64, 2, False), (16, 1, False), (32, 1, False)]
    if SMOKE:
        cells = [(16, 1, True)]
    for D, esz, iso in cells:
        eb = 8 * esz
        dt = np.uint8 if esz == 1 else np.uint16
        nr = (1 << (12 if SMOKE else 23)) // esz // D
        nr -= nr % 16
        raw = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
               % (1 << eb)).astype(dt)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=False)
        dense = decoder.gather_payloads(s, idx, D, esz, False)
        nd_pad = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd_pad)
        wp = pad_rows(idx.widths, nd_pad)
        maxb = dp.shape[2]
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        nbytes = raw.nbytes
        print(f"-- d{D} u{eb}: {nr} rows, maxb {maxb}", flush=True)

        def full(df, wf, nd_pad=nd_pad, maxb=maxb, D=D, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd_pad, 8, maxb), wf.reshape(nd_pad, D),
                "delta", esz, False)

        def unp(df, wf, nd_pad=nd_pad, maxb=maxb, D=D):
            return unpack_rows_rowmajor(
                df.reshape(nd_pad, 8, maxb).astype(jnp.int32),
                wf.reshape(nd_pad, D).astype(jnp.int32))

        variants = [("trans", "transpose"), ("wsel", "wordsel")]
        # exactness once
        pack.UNPACK_WLAYOUT = "transpose"
        jax.clear_caches()
        ref = jax.jit(full)(dfl, wfl)
        ref.block_until_ready()
        pack.UNPACK_WLAYOUT = "wordsel"
        jax.clear_caches()
        print(f"  wordsel exact: {_eq(ref, jax.jit(full)(dfl, wfl))}",
              flush=True)
        for rep in range(2):
            for tag, wl in variants:
                pack.UNPACK_WLAYOUT = wl
                jax.clear_caches()
                todo = [("full", full)] + ([("unp", unp)] if iso else [])
                for name, fn in todo:
                    try:
                        tme = devloop_time(fn, (dfl, wfl), iters)
                        print(f"  d{D}u{eb} {name}/{tag}: "
                              f"{nbytes / tme / 1e9:6.2f} GB/s "
                              f"({tme * 1e6:.0f} us)", flush=True)
                    except Exception as e:
                        print(f"  d{D}u{eb} {name}/{tag}: DIED "
                              f"{type(e).__name__} {str(e)[:60]}",
                              flush=True)
                        jax.block_until_ready(
                            jnp.zeros((8, 128), jnp.int32) + 1)
        pack.UNPACK_WLAYOUT = "transpose"
        jax.clear_caches()

    # -------- Part C: why is the 64 MiB kernel 10.8 vs 22.9 GB/s? ----
    # (bench r5 composed row: kernel leg at nb=131072 ran half speed.)
    # A/B the _CHUNK split and the devloop salting cost at that size.
    if not SMOKE:
        nr = 1 << 20
        raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
               % 256).astype(np.uint8)
        s = encoder.compress(raw.reshape(-1), 64, codec="delta")
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, 64, 1, lowdim=False)
        dense = decoder.gather_payloads(s, idx, 64, 1, False)
        nd_pad = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd_pad)
        wp = pad_rows(idx.widths, nd_pad)
        maxb = dp.shape[2]
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        nbytes = raw.nbytes
        print(f"-- C: 64 MiB u8 d64, nb_pad {nd_pad}, maxb {maxb}",
              flush=True)

        def full64(df, wf, nd_pad=nd_pad, maxb=maxb):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd_pad, 8, maxb), wf.reshape(nd_pad, 64),
                "delta", 1, False)

        for chunk in (16384, 32768, 65536):
            pack._CHUNK = chunk
            jax.clear_caches()
            for rep in range(2):
                try:
                    tme = devloop_time(full64, (dfl, wfl), 4)
                    print(f"  64MiB chunk={chunk}: "
                          f"{nbytes / tme / 1e9:6.2f} GB/s "
                          f"({tme * 1e6:.0f} us)", flush=True)
                except Exception as e:
                    print(f"  64MiB chunk={chunk}: DIED "
                          f"{type(e).__name__} {str(e)[:60]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)
        pack._CHUNK = 16384
        jax.clear_caches()
    print("SESSION46 DONE", flush=True)


if __name__ == "__main__":
    main()
