"""TPU session 30: MXU Pallas unpack, bf16-output + big-tile variants.

Session 28 measured the i32-output kernel at 16.5-17.1 GB/s vs the XLA
one-hot matmul's 25.6 (isolated) — the VPU-side A/W builds cost more
than the saved weight-tensor bandwidth. Two levers remain before
closing VERDICT item 5 angle b: halve the dominant output term with
bf16 (exact for u8 fields) and amortize grid overhead with tb=64.
Also A/Bs the full decode pass under the "mxu16" gate, and re-times the
runs-stream pass under it (the unpack is shared; VERDICT item 6).

Run:  timeout 5400 python -u tools/tpu_session30.py
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
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor
    from sprintz_tpu.ops.pallas_pack import unpack_rows_pallas_mxu
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(6)
    D = 64
    nrows = 1 << (10 if SMOKE else 17)
    iters = 2 if SMOKE else 16

    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    s = encoder.compress(raw.reshape(-1), D, codec="delta")
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, D, 1, lowdim=False)
    dense = decoder.gather_payloads(s, idx, D, 1, False)
    nd_pad = next_bucket(dense.shape[0])
    dj = jnp.asarray(pad_rows(dense, nd_pad))
    dj32 = dj.astype(jnp.int32)
    wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
    nbytes = raw.nbytes

    t = devloop_time(unpack_rows_rowmajor, (dj32, wj), iters)
    print(f"unpack xla bf16          : {nbytes / t / 1e9:6.2f} GB/s",
          flush=True)

    variants = ([(8, "bf16")] if SMOKE
                else [(32, "bf16"), (64, "bf16"), (64, "i32")])
    good = []
    for tb, od in variants:
        try:
            f = jax.jit(lambda d, w, tb=tb, od=od: unpack_rows_pallas_mxu(
                d, w, tb=tb, interpret=SMOKE, out_dtype=od))
            f.lower(dj, wj).compile()
            good.append((tb, od))
            print(f"pallas-mxu tb={tb} out={od}: compiled ok", flush=True)
        except Exception as e:
            print(f"pallas-mxu tb={tb} out={od}: COMPILE FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    if good:
        tb0, od0 = good[0]

        @jax.jit
        def check(d, d32, w):
            a = unpack_rows_rowmajor(d32, w)
            b = unpack_rows_pallas_mxu(d, w, tb=tb0, interpret=SMOKE,
                                       out_dtype=od0).astype(jnp.int32)
            return jnp.all(a == b)

        ok = bool(check(dj, dj32, wj))
        print(f"pallas-mxu tb={tb0} out={od0}: guarded run exact={ok}",
              flush=True)
        if not ok:
            good = []
    for tb, od in good:
        t2 = devloop_time(
            lambda d, w, tb=tb, od=od: unpack_rows_pallas_mxu(
                d, w, tb=tb, interpret=SMOKE, out_dtype=od), (dj, wj),
            iters)
        print(f"unpack pallas-mxu tb={tb:3d} out={od:>4}: "
              f"{nbytes / t2 / 1e9:6.2f} GB/s", flush=True)

    # full pass under the mxu16 gate
    def full(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    t3 = devloop_time(full, (dj, wj), iters)
    print(f"full decode pass xla     : {nbytes / t3 / 1e9:6.2f} GB/s",
          flush=True)
    if good:
        pack._USE_PALLAS = "mxu16"
        try:
            out_ref = np.asarray(full(dj, wj))[: idx.total_rows]
            ok = np.array_equal(out_ref.reshape(-1), raw.reshape(-1))
            print(f"full pass mxu16 exact={ok}", flush=True)
            if ok:
                t4 = devloop_time(full, (dj, wj), iters)
                print(f"full decode pass mxu16   : {nbytes / t4 / 1e9:6.2f}"
                      f" GB/s", flush=True)
        finally:
            pack._USE_PALLAS = "0"

    # runs-stream pass A/B (same unpack inside _decode_pass)
    seg = rng.integers(-6, 7, (nrows, D))
    m = (np.arange(nrows) // 256 % 3 == 0)[:, None]
    raw2 = (np.cumsum(np.where(m, 0, seg), axis=0) % 256).astype(np.uint8)
    s2 = encoder.compress(raw2.reshape(-1), D, codec="delta")
    ng2, _, _ = read_metadata_rle(s2)
    idx2 = decoder.walk_headers(s2, ng2, D, 1, lowdim=False)
    d2 = decoder.gather_payloads(s2, idx2, D, 1, False)
    rows_pad2 = next_bucket(int(idx2.total_rows))
    nd2 = next_bucket(d2.shape[0])
    orp = np.full(nd2, rows_pad2 + 8, dtype=np.int64)
    orp[: d2.shape[0]] = idx2.out_rows
    dj2 = jnp.asarray(pad_rows(d2, nd2))
    wj2 = jnp.asarray(pad_rows(idx2.widths, nd2))
    oj2 = jnp.asarray(orp, jnp.int32)

    def runs(d, w, o):
        return decoder._decode_pass.__wrapped__(
            d, w, o, "delta", 1, False, rows_pad2)

    for gate in (["0", "mxu16"] if good else ["0"]):
        pack._USE_PALLAS = gate
        try:
            out2 = np.asarray(runs(dj2, wj2, oj2))[: idx2.total_rows]
            ok2 = np.array_equal(out2.reshape(-1),
                                 raw2.reshape(-1)[: out2.size])
            t5 = devloop_time(runs, (dj2, wj2, oj2), iters)
            print(f"runs-stream pass gate={gate:>5}: "
                  f"{raw2.nbytes / t5 / 1e9:6.2f} GB/s exact={ok2}",
                  flush=True)
        finally:
            pack._USE_PALLAS = "0"

    print("SESSION30 DONE", flush=True)


if __name__ == "__main__":
    main()
