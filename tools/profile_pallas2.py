"""Cautious on-chip comparison of contiguous-decode variants.

Stage 1 (safe — kernels proven on this chip in round 1):
  A. production XLA contiguous pass
  B. pallas unpack (i32 io, ops/pallas_pack.py) + XLA zigzag/cumsum

Stage 2 (one risky experiment per run, env-gated: SPRINTZ_RISKY=k1u8 |
k1tot | k2): the new fused kernels faulted on-device once and a fault
wedges the chip for >1 h, so each suspect feature is tried alone.

Run: python tools/profile_pallas2.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import devloop_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sprintz_tpu import decoder
    from sprintz_tpu.models.forecasters import delta_encode, delta_decode
    from sprintz_tpu.ops.bitmath import block_widths_rowmajor, zigzag_decode
    from sprintz_tpu.ops.pack import pack_rows_rowmajor
    from sprintz_tpu.ops.pallas_pack import unpack_rows_pallas

    print(f"device: {jax.devices()[0]}", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)

    rng = np.random.default_rng(0)
    eb, D, nrows = 8, 64, 1 << 17
    vals = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256)
    nbytes = nrows * D
    nb = nrows // 8
    rows = jnp.asarray(vals, jnp.int32)
    errs = delta_encode(rows, eb).reshape(nb, 8, D)
    widths = block_widths_rowmajor(jnp.bitwise_or.reduce(errs, axis=1), 1)
    dense_u8 = pack_rows_rowmajor(errs, widths, 1).astype(jnp.uint8)
    dense_i32 = dense_u8.astype(jnp.int32)
    widths = jnp.asarray(widths, jnp.int32)

    def report(name, t):
        print(f"{name:36s} {t * 1e6:9.1f} us  {nbytes / t / 1e9:7.2f} GB/s",
              flush=True)

    risky = os.environ.get("SPRINTZ_RISKY")
    if not risky:
        # A. production XLA contiguous
        def xla_pass(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", 1, False)

        report("A_xla_contiguous",
               devloop_time(xla_pass, (dense_u8, widths), 64))

        # B. round-1 pallas unpack + XLA cumsum
        def pallas_b(d, w):
            e = unpack_rows_pallas(d, w, interpret=False)
            flat = e.reshape(nb * 8, D)
            v = delta_decode(flat, eb)
            return v.astype(jnp.uint8)

        ok = np.array_equal(
            np.asarray(jax.jit(pallas_b)(dense_i32, widths)).astype(np.int64),
            vals)
        print(f"B exact: {ok}", flush=True)
        report("B_pallas_unpack_i32+xla_cumsum",
               devloop_time(pallas_b, (dense_i32, widths), 64))
        return

    # --- risky single experiments ------------------------------------
    from sprintz_tpu.ops import pallas_decode as pd

    if risky == "k1u8":
        # K1 with u8 input/output but NO totals store
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        T = 32
        maxb = dense_u8.shape[2]

        def k(dref, wref, oref, out):
            w = wref[:]
            o = oref[:]
            q = o >> 3
            d = dref[:].astype(jnp.int32)
            acc = jnp.zeros((T, 8, D), jnp.int32)
            for j in range(maxb):
                rel = j - q
                sel = (rel >= 0) & (rel < 3)
                sh = jnp.clip(rel, 0, 2) << 3
                acc = acc + jnp.where(
                    sel[:, None, :],
                    d[:, :, j][:, :, None] << sh[:, None, :], 0)
            u = (acc >> (o & 7)[:, None, :]) & ((1 << w)[:, None, :] - 1)
            delta = (u >> 1) ^ -(u & 1)
            out[:] = (delta + 128).astype(jnp.uint8)

        off = jnp.cumsum(widths, axis=1) - widths
        fn = pl.pallas_call(
            k, grid=(nb // T,),
            in_specs=[
                pl.BlockSpec((T, 8, maxb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, D), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 8, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, 8, D), jnp.uint8),
        )
        r = np.asarray(fn(dense_u8, widths, off))
        want = np.asarray(
            ((zigzag_decode(errs, 8)) + 128).astype(jnp.uint8))
        print("k1u8 exact:", np.array_equal(r, want.reshape(nb, 8, D)),
              flush=True)
        report("k1u8", devloop_time(
            lambda d, w, o: fn(d, w, o), (dense_u8, widths, off), 64))
    elif risky == "k1tot":
        bz, tots = pd.unpack_zz(dense_u8, widths, 8, tile=32,
                                interpret=False)
        print("k1tot ran:", np.asarray(tots).shape, flush=True)
    elif risky == "k2":
        bz = jnp.asarray(rng.integers(0, 256, (nrows, D)), jnp.uint8)
        toff = jnp.zeros((nrows // 256, 1, D), jnp.int32)
        r = pd.prefix_finish(bz, toff, 8, 256, interpret=False)
        print("k2 ran:", np.asarray(r).shape, flush=True)
        report("k2_prefix_finish", devloop_time(
            lambda b, o: pd.prefix_finish(b, o, 8, 256, interpret=False),
            (bz, toff), 64))


if __name__ == "__main__":
    main()
