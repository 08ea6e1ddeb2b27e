"""One long-lived TPU session: claim once, then run everything.

Per-process device claims currently take tens of minutes through the
relay, but a claimed process runs at full speed — so bench + profiling
+ risky kernel bring-up all run here sequentially, ordered so a kernel
fault (which kills the chip) loses nothing already printed.

Run detached:  nohup python -u tools/tpu_session.py > /tmp/tpu_session.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print(f"claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    # ---- 1. the driver bench (banked first) -------------------------
    from bench import devloop_time, main as bench_main

    try:
        bench_main()
    except Exception as e:
        print(f"BENCH FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- 2. safe comparison: XLA contiguous vs round-1 pallas unpack -
    from sprintz_tpu import decoder
    from sprintz_tpu.models.forecasters import delta_decode, delta_encode
    from sprintz_tpu.ops.bitmath import block_widths_rowmajor
    from sprintz_tpu.ops.pack import pack_rows_rowmajor
    from sprintz_tpu.ops.pallas_pack import unpack_rows_pallas

    rng = np.random.default_rng(0)
    eb, D, nrows = 8, 64, 1 << 17
    vals = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256)
    nbytes = nrows * D
    nb = nrows // 8
    rows = jnp.asarray(vals, jnp.int32)
    errs = delta_encode(rows, eb).reshape(nb, 8, D)
    widths = jnp.asarray(
        block_widths_rowmajor(jnp.bitwise_or.reduce(errs, axis=1), 1),
        jnp.int32)
    dense_u8 = pack_rows_rowmajor(errs, widths, 1).astype(jnp.uint8)
    dense_i32 = dense_u8.astype(jnp.int32)

    def report(name, t):
        print(f"{name:40s} {t * 1e6:9.1f} us  {nbytes / t / 1e9:7.2f} GB/s",
              flush=True)

    def xla_pass(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    try:
        report("A_xla_contiguous",
               devloop_time(xla_pass, (dense_u8, widths), 64))
    except Exception as e:
        print(f"A failed: {e}", flush=True)

    def pallas_b(d, w):
        e = unpack_rows_pallas(d, w, interpret=False)
        v = delta_decode(e.reshape(nb * 8, D), eb)
        return v.astype(jnp.uint8)

    try:
        ok = np.array_equal(
            np.asarray(jax.jit(pallas_b)(dense_i32, widths)).astype(
                np.int64), vals)
        print(f"B exact: {ok}", flush=True)
        report("B_pallas_i32unpack_xla_cumsum",
               devloop_time(pallas_b, (dense_i32, widths), 64))
    except Exception as e:
        print(f"B failed: {type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---- 3. risky experiments, most valuable first -------------------
    # each can fault and wedge the chip; everything above is already out
    from sprintz_tpu.ops import pallas_decode as pd

    print("risk1: K2 prefix_finish (pl.dot tri matmul, u8 io)", flush=True)
    try:
        bz = jnp.asarray(rng.integers(0, 256, (nrows, D)), jnp.uint8)
        toff = jnp.zeros((nrows // 256, 1, D), jnp.int32)
        r = np.asarray(pd.prefix_finish(bz, toff, 8, 256, interpret=False))
        # correctness vs numpy
        deltas = np.asarray(bz).astype(np.int64) - 128
        want = (np.cumsum(deltas, axis=0) % 256).astype(np.uint8)
        print(f"  K2 ran, exact={np.array_equal(r, want)}", flush=True)
        report("K2_prefix_finish", devloop_time(
            lambda b, o: pd.prefix_finish(b, o, 8, 256, interpret=False),
            (bz, toff), 64))
    except Exception as e:
        print(f"  K2 failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    print("risk2: K1 unpack_zz (u8 io + zigzag + totals)", flush=True)
    try:
        bz2, tots = pd.unpack_zz(dense_u8, widths, 8, tile=32,
                                 interpret=False)
        bz2 = np.asarray(bz2)
        want_bz = np.asarray(
            ((errs >> 1) ^ -(errs & 1)) + 128).astype(np.uint8)
        print(f"  K1 ran, exact={np.array_equal(bz2, want_bz)}", flush=True)
        report("K1_unpack_zz", devloop_time(
            lambda d, w: pd.unpack_zz(d, w, 8, tile=32, interpret=False),
            (dense_u8, widths), 64))
    except Exception as e:
        print(f"  K1 failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    print("risk3: full fused pipeline", flush=True)
    try:
        got = np.asarray(pd.decode_delta_contiguous(
            dense_u8, widths, 8, block_tile=32, interpret=False))
        print(f"  fused ran, exact={np.array_equal(got.astype(np.int64), vals)}",
              flush=True)
        for bt in (16, 32, 64):
            report(f"fused_bt{bt}", devloop_time(
                lambda d, w, bt=bt: pd.decode_delta_contiguous(
                    d, w, 8, block_tile=bt, interpret=False),
                (dense_u8, widths), 64))
    except Exception as e:
        print(f"  fused failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    print("SESSION DONE", flush=True)


if __name__ == "__main__":
    main()
