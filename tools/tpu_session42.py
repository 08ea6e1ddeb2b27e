"""TPU session 42: flagship d64 decode — stage isolation + flat-param A/B.

VERDICT r4 item 1: the headline decode has sat at ~17.7 GB/s for three
rounds while encode found a 2.5x param-layout lever (sessions 40/41).
Here the same methodology points at the decode side:

Part A (u8 d64 headline stream, 8 MiB):
  full2d   - production pass: dense (nb, 8, 32) u8 + widths (nb, 64) u8
  fullfl   - SAME math, FLAT (nb*8*32,) u8 + (nb*64,) u8 params,
             reshaped inside jit (no padded-layout parameter at rest)
  fullw32  - production dense, widths passed as i32 (the r2 bench shape
             — the only HLO difference between the r2 and r4 kernels)
  unp2d/unpfl - isolated unpack (one-hot matmul), 2-D vs flat params
  prefix   - isolated zigzag + hierarchical prefix + narrow, fed the
             on-device (nb*8, 64) i32 errs
Part B (u16 d64, the 48.3 -> 42.1 regression, VERDICT item 2):
  u16w8 / u16w32 / u16fl interleaved x2 — if w32 recovers 48 the
  regression is the widths param dtype; if none do, r2's 48.3 was
  outside today's envelope and the bench guard records that.

Run:  timeout 5400 python -u tools/tpu_session42.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session42.py
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


def make_stream(rng, nrows, ndims, esz):
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    hi = 1 << (8 * esz)
    dt = np.uint8 if esz == 1 else np.uint16
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0)
           % hi).astype(dt)
    s = encoder.compress(raw.reshape(-1), ndims, codec="delta")
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, ndims, esz, lowdim=False)
    dense = decoder.gather_payloads(s, idx, ndims, esz, False)
    assert idx.total_rows == idx.widths.shape[0] * 8, "not contiguous"
    nd_pad = next_bucket(dense.shape[0])
    return (raw, pad_rows(dense, nd_pad), pad_rows(idx.widths, nd_pad))


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder
    from sprintz_tpu.models.forecasters import delta_decode
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(42)
    iters = 2 if SMOKE else 32
    ndims = 64
    nrows = (1 << (12 if SMOKE else 17))

    # ---------------- Part A: u8 d64 headline ----------------
    raw, dense, widths = make_stream(rng, nrows, ndims, 1)
    nbytes = raw.nbytes
    nb_pad, _, maxb = dense.shape
    dj = jnp.asarray(dense)          # (nb, 8, 32) u8
    wj = jnp.asarray(widths)         # (nb, 64) u8
    dfl = jnp.asarray(dense.reshape(-1))
    wfl = jnp.asarray(widths.reshape(-1))
    w32 = jnp.asarray(widths.astype(np.int32))
    print(f"-- u8 d64: {nrows} rows, dense {dense.shape}, "
          f"maxb {maxb}", flush=True)

    def full2d(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    def fullfl(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nb_pad, 8, maxb), wf.reshape(nb_pad, ndims),
            "delta", 1, False)

    def fullw32(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    def unp2d(d, w):
        return unpack_rows_rowmajor(d.astype(jnp.int32),
                                    w.astype(jnp.int32))

    def unpfl(df, wf):
        return unpack_rows_rowmajor(
            df.reshape(nb_pad, 8, maxb).astype(jnp.int32),
            wf.reshape(nb_pad, ndims).astype(jnp.int32))

    def prefix_only(e):
        return delta_decode(e.reshape(-1, ndims), 8).astype(jnp.uint8)

    # exactness once, on device, inside jit
    ref = jax.jit(full2d)(dj, wj)
    ref.block_until_ready()
    print("  full2d ran", flush=True)
    print(f"  fullfl exact: {_eq(ref, jax.jit(fullfl)(dfl, wfl))}",
          flush=True)
    print(f"  fullw32 exact: {_eq(ref, jax.jit(fullw32)(dj, w32))}",
          flush=True)
    errs_j = jax.jit(unp2d)(dj, wj)  # stays on device for prefix stage
    errs_j.block_until_ready()
    print(f"  unpfl exact: {_eq(errs_j, jax.jit(unpfl)(dfl, wfl))}",
          flush=True)

    for rep in range(2):
        for name, fn, args in [
                ("full2d", full2d, (dj, wj)),
                ("fullfl", fullfl, (dfl, wfl)),
                ("fullw32", fullw32, (dj, w32)),
                ("unp2d", unp2d, (dj, wj)),
                ("unpfl", unpfl, (dfl, wfl)),
                ("prefix", prefix_only, (errs_j,)),
        ]:
            try:
                t = devloop_time(fn, args, iters)
                print(f"  u8 {name:>8}: {nbytes / t / 1e9:6.2f} GB/s "
                      f"({t * 1e6:.0f} us)", flush=True)
            except Exception as e:
                print(f"  u8 {name:>8}: DIED {type(e).__name__} "
                      f"{str(e)[:70]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)

    # ---------------- Part B: u16 d64 regression ----------------
    raw, dense, widths = make_stream(rng, nrows // 2, ndims, 2)
    nbytes = raw.nbytes
    nb_pad, _, maxb = dense.shape
    dj = jnp.asarray(dense)
    wj = jnp.asarray(widths)                      # u8 widths (r3/r4)
    w32 = jnp.asarray(widths.astype(np.int32))    # i32 widths (r2)
    dfl = jnp.asarray(dense.reshape(-1))
    wfl = jnp.asarray(widths.reshape(-1))
    print(f"-- u16 d64: {nrows // 2} rows, dense {dense.shape}", flush=True)

    def u16pass(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 2, False)

    def u16fl(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nb_pad, 8, maxb), wf.reshape(nb_pad, ndims),
            "delta", 2, False)

    ref = jax.jit(u16pass)(dj, wj)
    ref.block_until_ready()
    print(f"  u16 w32 exact: {_eq(ref, jax.jit(u16pass)(dj, w32))}",
          flush=True)
    print(f"  u16 fl exact: {_eq(ref, jax.jit(u16fl)(dfl, wfl))}",
          flush=True)
    for rep in range(2):
        for name, fn, args in [("u16w8", u16pass, (dj, wj)),
                               ("u16w32", u16pass, (dj, w32)),
                               ("u16fl", u16fl, (dfl, wfl))]:
            try:
                t = devloop_time(fn, args, iters)
                print(f"  u16 {name:>7}: {nbytes / t / 1e9:6.2f} GB/s "
                      f"({t * 1e6:.0f} us)", flush=True)
            except Exception as e:
                print(f"  u16 {name:>7}: DIED {type(e).__name__} "
                      f"{str(e)[:70]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    print("SESSION42 DONE", flush=True)


if __name__ == "__main__":
    main()
