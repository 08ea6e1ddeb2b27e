"""TPU session 48: word-granular lowdim unpack (wsel32) A/B.

The d3 lowdim decode (2.36 GB/s after flat params) is pinned by the
lowdim unpack. wsel32 is the lowdim twin of the rowmajor wordsel that
won every maxb-8 cell: (EB/4)-deep lo/hi word select + one funnel
shift, ~4x fewer ops than the current d3 winner (jsel's 3 x EB-way
byte selects). Full contiguous decode pass, flat params, production
dispatch; baseline impl = auto (jsel for u8 D<=4 legacy shapes,
einsum otherwise).

Run:  timeout 5400 python -u tools/tpu_session48.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session48.py
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
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(48)
    iters = 2 if SMOKE else 16
    cells = ([(3, 1), (4, 1), (2, 2), (1, 1)] if not SMOKE else [(3, 1)])
    for D, esz in cells:
        eb = 8 * esz
        dt = np.uint8 if esz == 1 else np.uint16
        nr = (1 << (13 if SMOKE else 23)) // esz // D
        nr -= nr % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
               % (1 << eb)).astype(dt)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=True)
        dense = decoder.gather_payloads(s, idx, D, esz, True)
        assert idx.total_rows == idx.widths.shape[0] * 8
        nd_pad = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd_pad)
        wp = pad_rows(idx.widths, nd_pad)
        d1, d2 = dp.shape[1], dp.shape[2]
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        nbytes = raw.nbytes
        print(f"-- d{D} u{eb}: {nr} rows", flush=True)

        def full(df, wf, nd_pad=nd_pad, d1=d1, d2=d2, D=D, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd_pad, d1, d2), wf.reshape(nd_pad, D),
                "delta", esz, True)

        pack.LOWDIM_IMPL = "auto"
        jax.clear_caches()
        ref = jax.jit(full)(dfl, wfl)
        ref.block_until_ready()
        pack.LOWDIM_IMPL = "wsel32"
        jax.clear_caches()
        print(f"  wsel32 exact: {_eq(ref, jax.jit(full)(dfl, wfl))}",
              flush=True)
        for rep in range(2):
            for impl in ("auto", "wsel32"):
                pack.LOWDIM_IMPL = impl
                jax.clear_caches()
                try:
                    t = devloop_time(full, (dfl, wfl), iters)
                    print(f"  d{D}u{eb} {impl:>6}: "
                          f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)
                except Exception as e:
                    print(f"  d{D}u{eb} {impl:>6}: DIED "
                          f"{type(e).__name__} {str(e)[:60]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)
        pack.LOWDIM_IMPL = "auto"
        jax.clear_caches()
    print("SESSION48 DONE", flush=True)


if __name__ == "__main__":
    main()
