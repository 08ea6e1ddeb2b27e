"""TPU session 47: decode tile-size knee + wordsel validation at maxb=8.

Part A: the 64 MiB single-pass kernel runs 10.8 GB/s vs 22.9 at 8 MiB
(session 46: not the _CHUNK split). Sweep the production tile size by
timing the CHUNKED contiguous pass (state-carried, the decompress()
long-stream path) over the same 64 MiB stream at tile = 8/16/32 MiB
and the single 64 MiB pass. If small tiles win, CHUNK_OUT_BYTES drops
and the composed e2e row inherits the faster pipeline.

Part B: wordsel won d16 u8 (maxb=8, 2-deep word select) by 1.4x.
Validate d5 and d8 u8 (same maxb-8 shape class) before enabling an
auto rule, plus d16 u16 (maxb 16 expected — control).

Run:  timeout 5400 python -u tools/tpu_session47.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session47.py
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

    rng = np.random.default_rng(47)
    iters = 2 if SMOKE else 8

    # ---------------- Part A: tile-size knee ----------------
    nr = 1 << (13 if SMOKE else 20)
    raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
           % 256).astype(np.uint8)
    s = encoder.compress(raw.reshape(-1), 64, codec="delta")
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, 64, 1, lowdim=False)
    dense = decoder.gather_payloads(s, idx, 64, 1, False)
    nd_all = next_bucket(dense.shape[0])
    dp = pad_rows(dense, nd_all)
    wp = pad_rows(idx.widths, nd_all)
    maxb = dp.shape[2]
    nbytes = raw.nbytes
    print(f"-- A: {nbytes >> 20} MiB u8 d64, nb {nd_all}, maxb {maxb}",
          flush=True)

    # single pass (the current production choice at 64 MiB)
    dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
    wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))

    def single(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd_all, 8, maxb), wf.reshape(nd_all, 64),
            "delta", 1, False)

    for rep in range(2):
        t = devloop_time(single, (dfl, wfl), iters)
        print(f"  single pass: {nbytes / t / 1e9:6.2f} GB/s "
              f"({t * 1e6:.0f} us)", flush=True)

    # tiled: T state-carried chunk passes inside one jit (fori-style
    # python loop is fine — the tile count is static)
    for tiles in (2, 4, 8):
        nb_t = nd_all // tiles
        dt_ = jnp.asarray(np.ascontiguousarray(
            dp.reshape(tiles, nb_t, 8, maxb)).reshape(-1))
        wt_ = jnp.asarray(np.ascontiguousarray(
            wp.reshape(tiles, nb_t, 64)).reshape(-1))

        def tiled(df, wf, tiles=tiles, nb_t=nb_t):
            d = df.reshape(tiles, nb_t, 8, maxb)
            w = wf.reshape(tiles, nb_t, 64)
            state = jnp.zeros((3, 64), jnp.int32)
            outs = []
            for k in range(tiles):
                vals, state = \
                    decoder._decode_pass_contiguous_chunk.__wrapped__(
                        d[k], w[k], state, "delta", 1, False)
                outs.append(vals)
            return jnp.concatenate(outs)

        ok = _eq(jax.jit(single)(dfl, wfl), jax.jit(tiled)(dt_, wt_))
        print(f"  tiled x{tiles} exact: {ok}", flush=True)
        for rep in range(2):
            t = devloop_time(tiled, (dt_, wt_), iters)
            print(f"  tiled x{tiles} ({nbytes // tiles >> 20} MiB): "
                  f"{nbytes / t / 1e9:6.2f} GB/s ({t * 1e6:.0f} us)",
                  flush=True)

    # ---------------- Part B: wordsel at maxb-8 cells ----------------
    cells = ([(5, 1), (8, 1), (16, 2)] if not SMOKE else [(5, 1)])
    for D, esz in cells:
        eb = 8 * esz
        dt2 = np.uint8 if esz == 1 else np.uint16
        nr2 = (1 << (12 if SMOKE else 23)) // esz // D
        nr2 -= nr2 % 16
        raw2 = (np.cumsum(rng.integers(-6, 7, (nr2, D)), axis=0)
                % (1 << eb)).astype(dt2)
        s2 = encoder.compress(raw2.reshape(-1), D, codec="delta",
                              elem_sz=esz)
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, D, esz, lowdim=False)
        d2 = decoder.gather_payloads(s2, idx2, D, esz, False)
        nd2 = next_bucket(d2.shape[0])
        dp2 = pad_rows(d2, nd2)
        wp2 = pad_rows(idx2.widths, nd2)
        mb2 = dp2.shape[2]
        df2 = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
        wf2 = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))
        print(f"-- B: d{D} u{eb}, maxb {mb2}", flush=True)

        def full2(df, wf, nd2=nd2, mb2=mb2, D=D, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd2, 8, mb2), wf.reshape(nd2, D),
                "delta", esz, False)

        pack.UNPACK_WLAYOUT = "transpose"
        jax.clear_caches()
        ref = jax.jit(full2)(df2, wf2)
        ref.block_until_ready()
        pack.UNPACK_WLAYOUT = "wordsel"
        jax.clear_caches()
        print(f"  wordsel exact: {_eq(ref, jax.jit(full2)(df2, wf2))}",
              flush=True)
        for rep in range(2):
            for wl in ("transpose", "wordsel"):
                pack.UNPACK_WLAYOUT = wl
                jax.clear_caches()
                try:
                    t = devloop_time(full2, (df2, wf2), 16)
                    print(f"  d{D}u{eb} {wl[:5]}: "
                          f"{raw2.nbytes / t / 1e9:6.2f} GB/s", flush=True)
                except Exception as e:
                    print(f"  d{D}u{eb} {wl[:5]}: DIED "
                          f"{type(e).__name__} {str(e)[:60]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)
        pack.UNPACK_WLAYOUT = "transpose"
        jax.clear_caches()
    print("SESSION47 DONE", flush=True)


if __name__ == "__main__":
    main()
