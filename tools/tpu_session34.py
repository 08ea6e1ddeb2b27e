"""TPU session 34: paired-dim unpack A/B (halved weight tensor).

u8 width pairs always fit the exact-bf16 3-byte matmul window
((off&7) + w0 + w1 <= 23 bits), so one window per dim PAIR halves the
(nb, MAXB, D) unpack weight tensor — the headline decode's dominant
HBM term (~16x payload; docs/STATUS.md speed-of-light accounting). All
previous weight-reduction angles changed the FORMULATION and lost to
XLA's fused weight-build pipeline; this one keeps the exact same
pipeline and just halves the tensor. Interleaved ABAB x2: isolated
unpack + full decode pass + runs-stream pass + encode-side check.

Run:  timeout 5400 python -u tools/tpu_session34.py
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
    dj32 = jnp.asarray(pad_rows(dense, nd_pad)).astype(jnp.int32)
    dj = jnp.asarray(pad_rows(dense, nd_pad))
    wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
    nbytes = raw.nbytes

    # exactness first (device)
    @jax.jit
    def check(d32, w):
        a = unpack_rows_rowmajor(d32, w)
        b = unpack_rows_rowmajor(d32, w, pair=True)
        return jnp.all(a == b)

    print(f"pair unpack exact on device: {bool(check(dj32, wj))}",
          flush=True)

    # isolated unpack, interleaved
    for rep in range(2):
        for pairflag in (False, True):
            t = devloop_time(
                lambda d, w, p=pairflag: unpack_rows_rowmajor(d, w, pair=p),
                (dj32, wj), iters)
            print(f"unpack pair={int(pairflag)} rep{rep}: "
                  f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

    # full decode pass, interleaved (gate via module flag, trace-time)
    def full(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    prev = pack.UNPACK_PAIR
    try:
        for rep in range(2):
            for flag in (False, True):
                pack.UNPACK_PAIR = flag
                if rep == 0:
                    out = np.asarray(full(dj, wj))[: idx.total_rows]
                    ok = np.array_equal(out.reshape(-1), raw.reshape(-1))
                    if not ok:
                        print(f"full pass pair={int(flag)}: NOT EXACT",
                              flush=True)
                        continue
                t = devloop_time(full, (dj, wj), iters)
                print(f"full pass pair={int(flag)} rep{rep}: "
                      f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

        # runs stream (auto timeline; the dgather unpack also halves)
        seg = rng.integers(-6, 7, (nrows, D))
        m = (np.arange(nrows) // 256 % 3 == 0)[:, None]
        raw2 = (np.cumsum(np.where(m, 0, seg), axis=0) % 256
                ).astype(np.uint8)
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

        for rep in range(2):
            for flag in (False, True):
                pack.UNPACK_PAIR = flag
                if rep == 0:
                    out2 = np.asarray(runs(dj2, wj2, oj2))[: idx2.total_rows]
                    ok2 = np.array_equal(out2.reshape(-1),
                                         raw2.reshape(-1)[: out2.size])
                    if not ok2:
                        print(f"runs pair={int(flag)}: NOT EXACT",
                              flush=True)
                        continue
                t = devloop_time(runs, (dj2, wj2, oj2), iters)
                print(f"runs pass pair={int(flag)} rep{rep}: "
                      f"{raw2.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    finally:
        pack.UNPACK_PAIR = prev

    print("SESSION34 DONE", flush=True)


if __name__ == "__main__":
    main()
