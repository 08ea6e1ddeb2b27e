"""TPU session 6: device A/B of the width-stratified lowdim kernels.

Session-5 baselines: delta/u8 d4 lowdim 1.67 GB/s, delta/u16 d2 lowdim
2.41 GB/s (einsum, fold=0), lowdim encode d4 0.65 GB/s. Hypothesis from
the op-count analysis: the lowdim pass is dominated by the unpack's
per-byte select-accumulate / one-hot matmul work; "wselect" stratifies
by width (lowdim field layout is static per width — bit offset r*w, no
cross-dim cumsum) for ~6x fewer element-ops.

Grid, each exactness-checked before timing (pure XLA, no fault risk):
  1. decode d4 u8 / d2 u16 / d1 u8: einsum vs wselect
  2. encode pass d4 u8 / d2 u16: einsum vs wselect
  3. stage isolation (d4 u8): unpack-only einsum vs wselect,
     prefix-only (hierarchical_cumsum), to locate the remaining floor

Run detached:  nohup python -u tools/tpu_session6.py > /tmp/tpu_session6.log 2>&1 &
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

    def time_only(tag, kern, args, nbytes, iters=16):
        if SMOKE:
            jax.block_until_ready(jax.jit(kern)(*args))
            print(f"{tag:52s} compiled+ran (smoke)", flush=True)
            return
        t = devloop_time(kern, args, iters)
        print(f"{tag:52s} {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)

    def set_impl(lowdim_impl):
        pack.LOWDIM_IMPL = lowdim_impl
        jax.clear_caches()

    # ---- 1. lowdim decode grid ----------------------------------------
    nrl = 1 << 13 if SMOKE else 1 << 20
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    rawl1 = (np.cumsum(rng.integers(-6, 7, (nrl, 1)), axis=0) % 256
             ).astype(np.uint8)
    idx8, dj8, wj8 = prep(rawl8, 4, "delta", 1, True)
    idx16, dj16, wj16 = prep(rawl16, 2, "delta", 2, True)
    idx1, dj1, wj1 = prep(rawl1, 1, "delta", 1, True)

    def kern8(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, True)

    def kern16(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 2, True)

    for impl in ("einsum", "wselect"):
        set_impl(impl)
        check_time(f"delta/u8 d4 lowdim decode [{impl}]",
                   kern8, (dj8, wj8), rawl8, idx8.total_rows)
    for impl in ("einsum", "wselect"):
        set_impl(impl)
        check_time(f"delta/u16 d2 lowdim decode [{impl}]",
                   kern16, (dj16, wj16), rawl16, idx16.total_rows)
    for impl in ("einsum", "wselect"):
        set_impl(impl)
        check_time(f"delta/u8 d1 lowdim decode [{impl}]",
                   kern8, (dj1, wj1), rawl1, idx1.total_rows)

    # ---- 2. lowdim encode pass ----------------------------------------
    rows8_j = jnp.asarray(rawl8.astype(np.int32))
    rows16_j = jnp.asarray(rawl16.astype(np.int32))

    def kern_enc8(r):
        return encoder._encode_pass.__wrapped__(r, "delta", 1, True)

    def kern_enc16(r):
        return encoder._encode_pass.__wrapped__(r, "delta", 2, True)

    for impl in ("einsum", "wselect"):
        set_impl(impl)
        time_only(f"lowdim encode pass d4 u8 [{impl}]",
                  kern_enc8, (rows8_j,), rawl8.nbytes)
    for impl in ("einsum", "wselect"):
        set_impl(impl)
        time_only(f"lowdim encode pass d2 u16 [{impl}]",
                  kern_enc16, (rows16_j,), rawl16.nbytes)

    # ---- 3. stage isolation (d4 u8) -----------------------------------
    for impl in ("einsum", "wselect"):
        set_impl(impl)
        time_only(f"stage: lowdim unpack d4 [{impl}]",
                  lambda d, w: pack.unpack_dims_lowdim(d.astype(jnp.int32),
                                                       w.astype(jnp.int32)),
                  (dj8, wj8), rawl8.nbytes)
    errs_flat = jnp.zeros((nrl, 4), jnp.int32)
    time_only("stage: prefix hierarchical_cumsum (N,4)",
              lambda x: fc.hierarchical_cumsum(x, value_bits=8),
              (errs_flat,), rawl8.nbytes)

    set_impl("einsum")
    print("SESSION6 DONE", flush=True)


if __name__ == "__main__":
    main()
