"""TPU session 5: device A/B of the lowdim lane-utilization fixes.

Pure XLA — no fault risk. Session-4 baselines: delta/u8 lowdim d4
1.63 GB/s, delta/u16 lowdim d2 2.41 GB/s, headline d64 scatter-free
decode ~18 GB/s.

Grid, each exactness-checked before timing:
  1. delta/u8 d4 and delta/u16 d2 contiguous decode for
     (LOWDIM_IMPL, PREFIX_FOLD) in {select,einsum} x {1,0}
  2. headline delta/u8 d64: PREFIX_FOLD 0 vs 1 (pf == 64 sits at the
     auto threshold; is folding also a rowmajor win?)
  3. lowdim encode pass d4 (select vs einsum)

Run detached:  nohup python -u tools/tpu_session5.py > /tmp/tpu_session5.log 2>&1 &
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
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)

    def prep(raw, D, codec, elem_sz, lowdim):
        s = encoder.compress(raw.reshape(-1), D, codec=codec,
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, elem_sz, lowdim=lowdim)
        dense = decoder.gather_payloads(s, idx, D, elem_sz, lowdim)
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

    def set_impl(lowdim_impl, fold):
        pack.LOWDIM_IMPL = lowdim_impl
        fc.PREFIX_FOLD = fold
        jax.clear_caches()

    # ---- 1. lowdim decode grid ----------------------------------------
    nrl = 1 << 13 if SMOKE else 1 << 20
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    idx8, dj8, wj8 = prep(rawl8, 4, "delta", 1, True)
    idx16, dj16, wj16 = prep(rawl16, 2, "delta", 2, True)

    def kern8(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, True)

    def kern16(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 2, True)

    for impl in ("select", "einsum"):
        for fold in ("1", "0"):
            set_impl(impl, fold)
            check_time(f"delta/u8 d4 lowdim [{impl}, fold={fold}]",
                       kern8, (dj8, wj8), rawl8, idx8.total_rows)
    for impl in ("select", "einsum"):
        for fold in ("1", "0"):
            set_impl(impl, fold)
            check_time(f"delta/u16 d2 lowdim [{impl}, fold={fold}]",
                       kern16, (dj16, wj16), rawl16, idx16.total_rows)

    # ---- 2. headline d64: fold A/B ------------------------------------
    D, nrows = 64, (1 << 12 if SMOKE else 1 << 17)
    raw8 = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
            ).astype(np.uint8)
    idxh, djh, wjh = prep(raw8, D, "delta", 1, False)

    def kernh(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    for fold in ("0", "1"):
        set_impl("select", fold)
        check_time(f"delta/u8 d64 rowmajor [fold={fold}]",
                   kernh, (djh, wjh), raw8, idxh.total_rows)

    # ---- 3. lowdim encode pass d4 -------------------------------------
    rows_j = jnp.asarray(rawl8.astype(np.int32))

    def kern_enc(r):
        return encoder._encode_pass.__wrapped__(r, "delta", 1, True)

    for impl in ("select", "einsum"):
        set_impl(impl, "auto")
        if SMOKE:
            jax.block_until_ready(jax.jit(kern_enc)(rows_j))
            print(f"encode d4 [{impl}]: compiled+ran (smoke)", flush=True)
        else:
            t = devloop_time(kern_enc, (rows_j,), 16)
            print(f"lowdim encode pass d4 [{impl}]: {t * 1e6:9.1f} us  "
                  f"{rawl8.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    set_impl("select", "auto")
    print("SESSION5 DONE", flush=True)


if __name__ == "__main__":
    main()
