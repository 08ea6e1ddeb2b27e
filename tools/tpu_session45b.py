"""TPU session 45b: remaining cells — u16 ndims + xff-batch grid

(The first session 45 run completed the u8 curve then died on a relay
UNAVAILABLE; this rerun covers only the missing parts.)

Original header: ndims curve (flat-param production) + xff-batch
operating curve (VERDICT r4 items 6 and 10).

Part A: delta decode+encode kernels at u8 D in {5, 8, 16, 31, 32, 33}
and u16 D in {3, 5, 16, 17} — the d5-d8 cells just past the lowdim
boundary are the reference's documented worst zone
(communicate/results.tex:156-162,180), and 31/33 probe the non-pow2
lane penalty the session-11 cost map predicts. 8 MiB per config,
production dispatch (flat params).

Part B: batched FIRE encode at S in {16, 64, 512} streams x {16 KiB,
1 MiB} per stream — the full operating curve instead of round 4's
single favorable point (S=512 x 16 KiB = 27.1 GB/s; the S=64/1 MiB
cell was 4.6, below the ref's 5 GB/s AVX2 row). Rows upload as u8 and
widen on device (a 512 MiB i32 param would take minutes through the
relay).

Run:  timeout 5400 python -u tools/tpu_session45.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session45.py
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

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.constants import LOWDIM_MAX_NDIMS
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(450)
    iters = 2 if SMOKE else 16

    # ---------------- Part A: ndims curve ----------------
    cells = ([(3, 2), (5, 2), (16, 2), (17, 2)]
             if not SMOKE else [(3, 2)])
    for D, esz in cells:
        eb = 8 * esz
        dt = np.uint8 if esz == 1 else np.uint16
        nr = (1 << (12 if SMOKE else 23)) // esz // D
        nr -= nr % 16
        raw = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
               % (1 << eb)).astype(dt)
        lowdim = D <= LOWDIM_MAX_NDIMS[esz]
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=lowdim)
        dense = decoder.gather_payloads(s, idx, D, esz, lowdim)
        if idx.total_rows != idx.widths.shape[0] * 8:
            print(f"  d{D} u{eb}: NOT contiguous, skip", flush=True)
            continue
        nd_pad = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd_pad)
        wp = pad_rows(idx.widths, nd_pad)
        d1, d2 = dp.shape[1], dp.shape[2]
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        nbytes = raw.nbytes

        def dec(df, wf, nd_pad=nd_pad, d1=d1, d2=d2, D=D, esz=esz,
                lowdim=lowdim):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd_pad, d1, d2), wf.reshape(nd_pad, D),
                "delta", esz, lowdim)

        # encode: the production dispatch (flat for auto cells)
        nbm = nr // 8
        nbp = next_bucket(nbm)
        rows_p = pad_rows(raw, nbp * 8)
        use_flat = (lowdim and ((esz == 1 and D in (2, 3, 4))
                                or (esz == 2 and D == 2)))
        if use_flat:
            arg_e = jnp.asarray(rows_p.reshape(-1))

            def enc(r, D=D, esz=esz):
                return encoder._encode_pass.__wrapped__(
                    r, "delta", esz, True, flat_ndims=D)
        else:
            arg_e = jnp.asarray(rows_p)

            def enc(r, esz=esz, lowdim=lowdim):
                return encoder._encode_pass.__wrapped__(
                    r.astype(jnp.int32), "delta", esz, lowdim)

        for rep in range(2):
            for name, fn, args in [("dec", dec, (dfl, wfl)),
                                   ("enc", enc, (arg_e,))]:
                try:
                    tme = devloop_time(fn, args, iters)
                    print(f"  d{D} u{eb} {name}: "
                          f"{nbytes / tme / 1e9:6.2f} GB/s", flush=True)
                except Exception as e:
                    print(f"  d{D} u{eb} {name}: DIED "
                          f"{type(e).__name__} {str(e)[:60]}", flush=True)
                    jax.block_until_ready(
                        jnp.zeros((8, 128), jnp.int32) + 1)

    # ---------------- Part B: xff-batch curve ----------------
    ndims = 64
    grid = ([(16, 256), (64, 256), (512, 256),
             (16, 16384), (64, 16384), (512, 16384)]
            if not SMOKE else [(4, 64)])
    for S, nr in grid:
        raws = (np.cumsum(rng.integers(-6, 7, (S, nr, ndims)), axis=1)
                % 256).astype(np.uint8)
        rows_j = jnp.asarray(raws)  # u8: widen on device

        def benc(r):
            return jax.vmap(
                lambda x: encoder._encode_pass.__wrapped__(
                    x.astype(jnp.int32), "xff", 1, False))(r)

        kib = nr * ndims // 1024
        try:
            tme = devloop_time(benc, (rows_j,), max(2, iters // 4))
            print(f"  xff-batch S={S:<4d} {kib:>5d} KiB/stream: "
                  f"{raws.nbytes / tme / 1e9:6.2f} GB/s", flush=True)
        except Exception as e:
            print(f"  xff-batch S={S} {kib} KiB: DIED "
                  f"{type(e).__name__} {str(e)[:60]}", flush=True)
            jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    print("SESSION45B DONE", flush=True)


if __name__ == "__main__":
    main()
