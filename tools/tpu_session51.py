"""TPU session 51: u16 decode tile knee + d3 wselect re-A/B (flat era).

Part A: the u16 64 MiB composed-row kernel leg measured 16.0 GB/s with
8 MiB output tiles while the 8 MiB single-stream kernel runs 49 — the
u8 knee (8 MiB tiles best) may not transfer to u16. Measure the 64 MiB
u16 stream as a single pass and as 2/4/8 state-carried tiles.

Part B: d3 u8 lowdim decode is pinned at 2.36 (jsel, flat params);
wselect (width-stratified STATIC shifts — no lane-varying funnel, the
exact op class session 48 indicted) lost narrowly in the OLD param era
(2.28 vs 2.35 at d2u16, session 6). Re-A/B at d3/d4 with flat params.

Run:  timeout 5400 python -u tools/tpu_session51.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _eq(a, b) -> bool:
    import jax
    import jax.numpy as jnp

    return bool(jax.jit(jnp.array_equal)(a, b))


def main():
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(51)

    # ---------------- Part A: u16 tile knee ----------------
    nr = 1 << 19  # 64 MiB u16 d64
    raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
           % 65536).astype(np.uint16)
    s = encoder.compress(raw.reshape(-1), 64, codec="delta", elem_sz=2)
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, 64, 2, lowdim=False)
    dense = decoder.gather_payloads(s, idx, 64, 2, False)
    nd_all = next_bucket(dense.shape[0])
    dp = pad_rows(dense, nd_all)
    wp = pad_rows(idx.widths, nd_all)
    maxb = dp.shape[2]
    nbytes = raw.nbytes
    dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
    wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
    print(f"-- A: 64 MiB u16 d64, nb {nd_all}, maxb {maxb}", flush=True)

    def single(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd_all, 8, maxb), wf.reshape(nd_all, 64),
            "delta", 2, False)

    for rep in range(2):
        t = devloop_time(single, (dfl, wfl), 4)
        print(f"  u16 single: {nbytes / t / 1e9:6.2f} GB/s "
              f"({t * 1e6:.0f} us)", flush=True)
    for tiles in (2, 4, 8):
        nb_t = nd_all // tiles

        def tiled(df, wf, tiles=tiles, nb_t=nb_t):
            d = df.reshape(tiles, nb_t, 8, maxb)
            w = wf.reshape(tiles, nb_t, 64)
            state = jnp.zeros((3, 64), jnp.int32)
            outs = []
            for k in range(tiles):
                vals, state = \
                    decoder._decode_pass_contiguous_chunk.__wrapped__(
                        d[k], w[k], state, "delta", 2, False)
                outs.append(vals)
            return jnp.concatenate(outs)

        if tiles == 2:
            print(f"  tiled exact: "
                  f"{_eq(jax.jit(single)(dfl, wfl), jax.jit(tiled)(dfl, wfl))}",
                  flush=True)
        for rep in range(2):
            t = devloop_time(tiled, (dfl, wfl), 4)
            print(f"  u16 tiled x{tiles}: {nbytes / t / 1e9:6.2f} GB/s "
                  f"({t * 1e6:.0f} us)", flush=True)

    # ---------------- Part B: d3/d4 wselect re-A/B ----------------
    for D, esz in [(3, 1), (4, 1)]:
        eb = 8 * esz
        dt = np.uint8 if esz == 1 else np.uint16
        nr2 = (1 << 23) // esz // D
        nr2 -= nr2 % 8
        raw2 = (np.cumsum(rng.integers(-6, 7, (nr2, D)), axis=0)
                % (1 << eb)).astype(dt)
        s2 = encoder.compress(raw2.reshape(-1), D, codec="delta",
                              elem_sz=esz)
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, D, esz, lowdim=True)
        d2 = decoder.gather_payloads(s2, idx2, D, esz, True)
        nd2 = next_bucket(d2.shape[0])
        dp2 = pad_rows(d2, nd2)
        wp2 = pad_rows(idx2.widths, nd2)
        d1_, d2_ = dp2.shape[1], dp2.shape[2]
        df2 = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
        wf2 = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))
        print(f"-- B: d{D} u{eb}", flush=True)

        def full(df, wf, nd2=nd2, d1_=d1_, d2_=d2_, D=D, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd2, d1_, d2_), wf.reshape(nd2, D),
                "delta", esz, True)

        pack.LOWDIM_IMPL = "auto"
        jax.clear_caches()
        ref = jax.jit(full)(df2, wf2)
        ref.block_until_ready()
        pack.LOWDIM_IMPL = "wselect"
        jax.clear_caches()
        print(f"  wselect exact: {_eq(ref, jax.jit(full)(df2, wf2))}",
              flush=True)
        for rep in range(2):
            for impl in ("auto", "wselect"):
                pack.LOWDIM_IMPL = impl
                jax.clear_caches()
                try:
                    t = devloop_time(full, (df2, wf2), 16)
                    print(f"  d{D}u{eb} {impl:>7}: "
                          f"{raw2.nbytes / t / 1e9:6.2f} GB/s", flush=True)
                except Exception as e:
                    print(f"  d{D}u{eb} {impl:>7}: DIED "
                          f"{type(e).__name__} {str(e)[:60]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)
        pack.LOWDIM_IMPL = "auto"
        jax.clear_caches()
    print("SESSION51 DONE", flush=True)


if __name__ == "__main__":
    main()
