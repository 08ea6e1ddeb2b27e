"""TPU session 13: grouped-pass unpack impl A/B (einsum / einsum2 / dyn).

Session 12: grouped pass beats legacy 1.21x (2.02 vs 1.67 GB/s d4u8)
with the default einsum unpack — whose one-hot w is (c, 8, GD, EB)
minor-8, i.e. 16x-padded writes (session-11 probe: minor-8 shapes run
~10 GB/s-equiv). Candidates: einsum2 (w reordered (c, EB, 8, GD), no
minor-8 tensor) and dyn (variable-shift extraction, no matmul — a pure
elementwise chain XLA should fuse to input+output traffic). Plus stage
isolation of the winner.

Run detached:  nohup python -u tools/tpu_session13.py > /tmp/tpu_session13.log 2>&1 &
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
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    decoder.LOWDIM_PASS = "grouped"

    rng = np.random.default_rng(0)
    nrl = 1 << 13 if SMOKE else 1 << 20

    def mkraw(D, esz):
        lim = 6 if esz == 1 else 300
        dt = np.uint8 if esz == 1 else np.uint16
        return (np.cumsum(rng.integers(-lim, lim + 1, (nrl, D)), axis=0)
                % (1 << (8 * esz))).astype(dt)

    def prep(raw, D, elem_sz):
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, elem_sz, lowdim=True)
        dense = decoder.gather_payloads(s, idx, D, elem_sz, True)
        nd = next_bucket(dense.shape[0])
        dj = jnp.asarray(pad_rows(dense, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))
        return idx, dj, wj

    def check_time(tag, kern, args, raw, nrows_packed, iters=16):
        got = np.asarray(jax.jit(kern)(*args))
        ok = np.array_equal(got[:nrows_packed].astype(np.int64),
                            raw[:nrows_packed].astype(np.int64))
        if SMOKE:
            print(f"{tag:52s} exact={ok}  (smoke)", flush=True)
            assert ok, tag
            return
        t = devloop_time(kern, args, iters)
        print(f"{tag:52s} exact={ok}  {t * 1e6:9.1f} us  "
              f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    # ---- grouped decode, unpack impl A/B --------------------------------
    for D, esz, tag in ((4, 1, "d4 u8"), (2, 2, "d2 u16"), (1, 1, "d1 u8")):
        raw = mkraw(D, esz)
        idx, dj, wj = prep(raw, D, esz)

        def kern(d, w, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, True)

        for impl in ("dyn", "einsum2", "einsum"):
            pack.LOWDIM_IMPL = impl
            jax.clear_caches()
            check_time(f"grouped {tag} decode [{impl}]",
                       kern, (dj, wj), raw, idx.total_rows)

    # ---- stage isolation: grouped d4u8 with the dyn unpack ---------------
    raw = mkraw(4, 1)
    idx, dj, wj = prep(raw, 4, 1)
    g = pack.lowdim_group(4)
    nb = dj.shape[0]
    c = nb // g
    dg = dj.astype(jnp.int32).reshape(c, g * 4, 8)
    wg = wj.astype(jnp.int32).reshape(c, g * 4)

    for impl in ("dyn", "einsum2", "einsum"):
        pack.LOWDIM_IMPL = impl
        jax.clear_caches()

        def unp(d, w):
            return pack.unpack_dims_lowdim(d, w)

        if SMOKE:
            jax.block_until_ready(jax.jit(unp)(dg, wg))
            print(f"stage unpack [{impl}] ok (smoke)", flush=True)
            continue
        t = devloop_time(unp, (dg, wg), 16)
        print(f"stage: grouped unpack d4 [{impl}]  {t * 1e6:9.1f} us  "
              f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    print("SESSION13 DONE", flush=True)


if __name__ == "__main__":
    main()
