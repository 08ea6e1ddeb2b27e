"""TPU session 2: bank bench, then A/B MXU formats and prefix chunk sizes.

Protocol (STATUS.md): one long-lived claimed process; safest work first
so nothing already printed is lost if a later experiment faults. All
experiments here are pure XLA (no Pallas) — no fault risk expected.

Run detached:  nohup python -u tools/tpu_session2.py > /tmp/tpu_session2.log 2>&1 &
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    # ---- 1. the driver bench (banked first; includes xff-par + encode) --
    from bench import devloop_time, main as bench_main

    try:
        bench_main()
    except Exception as e:
        print(f"BENCH FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- 2. A/B: full contiguous decode pass, bf16 vs s8 ---------------
    import sprintz_tpu.ops.pack as pack
    from sprintz_tpu import decoder
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.models.forecasters import delta_encode
    from sprintz_tpu.ops.bitmath import block_widths_rowmajor
    from sprintz_tpu.ops.pack import pack_rows_rowmajor

    rng = np.random.default_rng(0)
    D, nrows = 64, 1 << 17
    vals = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256)
    nbytes = nrows * D
    nb = nrows // 8
    rows = jnp.asarray(vals, jnp.int32)
    errs = delta_encode(rows, 8).reshape(nb, 8, D)
    widths = jnp.asarray(
        block_widths_rowmajor(jnp.bitwise_or.reduce(errs, axis=1), 1),
        jnp.int32)
    dense_u8 = pack_rows_rowmajor(errs, widths, 1).astype(jnp.uint8)
    jax.block_until_ready(dense_u8)

    def report(name, t, b=nbytes):
        print(f"{name:44s} {t * 1e6:9.1f} us  {b / t / 1e9:7.2f} GB/s",
              flush=True)

    def full_pass(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    for impl in ("bf16", "s8"):
        pack.MXU_IMPL = impl
        jax.clear_caches()
        try:
            got = np.asarray(jax.jit(full_pass)(dense_u8, widths))
            ok = np.array_equal(got.astype(np.int64), vals)
            t = devloop_time(full_pass, (dense_u8, widths), 64)
            report(f"decode_pass[{impl}] exact={ok}", t)
        except Exception as e:
            print(f"decode_pass[{impl}] FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---- 3. stage: unpack alone, bf16 vs s8 ----------------------------
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor

    dense_i32 = dense_u8.astype(jnp.int32)
    for impl in ("bf16", "s8"):
        pack.MXU_IMPL = impl
        jax.clear_caches()
        try:
            got = np.asarray(
                jax.jit(unpack_rows_rowmajor)(dense_i32, widths))
            ok = np.array_equal(got, np.asarray(errs))
            t = devloop_time(unpack_rows_rowmajor, (dense_i32, widths), 64)
            report(f"unpack[{impl}] exact={ok}", t)
        except Exception as e:
            print(f"unpack[{impl}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # ---- 4. stage: prefix sum, impl x chunk sweep ----------------------
    deltas8 = jnp.asarray(rng.integers(-128, 128, (nrows, D)), jnp.int32)
    want8 = np.cumsum(np.asarray(deltas8, np.int64), axis=0).astype(np.int32)
    deltas16 = jnp.asarray(rng.integers(-32768, 32768, (nrows // 2, D)),
                           jnp.int32)
    want16 = np.cumsum(np.asarray(deltas16, np.int64), axis=0
                       ).astype(np.int32)
    for impl in ("bf16", "s8"):
        pack.MXU_IMPL = impl
        for chunk in (128, 256, 512, 1024):
            jax.clear_caches()
            try:
                f8 = lambda x: fc.hierarchical_cumsum(
                    x, chunk=chunk, value_bits=8)
                ok = np.array_equal(np.asarray(jax.jit(f8)(deltas8)), want8)
                t = devloop_time(f8, (deltas8,), 64)
                report(f"prefix8[{impl},c{chunk}] exact={ok}", t)
            except Exception as e:
                print(f"prefix8[{impl},c{chunk}] FAILED: {str(e)[:150]}",
                      flush=True)
        # u16 at the best-known chunk only (compile time through the relay)
        jax.clear_caches()
        try:
            f16 = lambda x: fc.hierarchical_cumsum(
                x, chunk=512, value_bits=16)
            ok = np.array_equal(np.asarray(jax.jit(f16)(deltas16)), want16)
            t = devloop_time(f16, (deltas16,), 64)
            report(f"prefix16[{impl},c512] exact={ok}", t, b=nbytes)
        except Exception as e:
            print(f"prefix16[{impl},c512] FAILED: {str(e)[:150]}",
                  flush=True)

    print("SESSION2 DONE", flush=True)


if __name__ == "__main__":
    main()
