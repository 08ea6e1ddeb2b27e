"""Bisect the on-device Pallas kernel fault: run each suspect feature in
isolation on tiny inputs. python tools/debug_pallas.py"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0]}", flush=True)
    T, D, M = 16, 64, 32
    nb = 64
    rng = np.random.default_rng(0)
    dense_u8 = jnp.asarray(rng.integers(0, 256, (nb, 8, M)), jnp.uint8)
    dense_i32 = dense_u8.astype(jnp.int32)
    widths = jnp.asarray(rng.integers(0, 7, (nb, D)), jnp.int32)
    off = jnp.cumsum(widths, axis=1) - widths

    def attempt(name, fn):
        try:
            r = fn()
            _ = [np.asarray(x) for x in (r if isinstance(r, tuple) else (r,))]
            print(f"  OK    {name}", flush=True)
        except Exception as e:
            print(f"  FAIL  {name}: {type(e).__name__} {str(e)[:150]}",
                  flush=True)

    def mk(kernel, in_arrs, in_specs, out_specs, out_shape):
        return pl.pallas_call(
            kernel, grid=(nb // T,), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape, interpret=False,
        )(*in_arrs)

    spec_dense = pl.BlockSpec((T, 8, M), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((T, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((T, 8, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_tot = pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    # V0: i32 dense, i32 out, no totals (round-1 known-good shape)
    def k_v0(dref, wref, oref, out):
        w = wref[:]
        o = oref[:]
        q = o >> 3
        d = dref[:]
        acc = jnp.zeros((T, 8, D), jnp.int32)
        for j in range(M):
            rel = j - q
            sel = (rel >= 0) & (rel < 3)
            sh = jnp.clip(rel, 0, 2) << 3
            acc = acc + jnp.where(sel[:, None, :],
                                  d[:, :, j][:, :, None] << sh[:, None, :], 0)
        out[:] = (acc >> (o & 7)[:, None, :]) & ((1 << w)[:, None, :] - 1)

    attempt("v0 i32-in i32-out", lambda: mk(
        k_v0, (dense_i32, widths, off), [spec_dense, spec_w, spec_w],
        spec_out, jax.ShapeDtypeStruct((nb, 8, D), jnp.int32)))

    # V1: u8 dense input, cast inside
    def k_v1(dref, wref, oref, out):
        w = wref[:]
        o = oref[:]
        q = o >> 3
        d = dref[:].astype(jnp.int32)
        acc = jnp.zeros((T, 8, D), jnp.int32)
        for j in range(M):
            rel = j - q
            sel = (rel >= 0) & (rel < 3)
            sh = jnp.clip(rel, 0, 2) << 3
            acc = acc + jnp.where(sel[:, None, :],
                                  d[:, :, j][:, :, None] << sh[:, None, :], 0)
        out[:] = (acc >> (o & 7)[:, None, :]) & ((1 << w)[:, None, :] - 1)

    attempt("v1 u8-in i32-out", lambda: mk(
        k_v1, (dense_u8, widths, off), [spec_dense, spec_w, spec_w],
        spec_out, jax.ShapeDtypeStruct((nb, 8, D), jnp.int32)))

    # V2: u8 out (zigzag+bias)
    def k_v2(dref, wref, oref, out):
        w = wref[:]
        o = oref[:]
        q = o >> 3
        d = dref[:].astype(jnp.int32)
        acc = jnp.zeros((T, 8, D), jnp.int32)
        for j in range(M):
            rel = j - q
            sel = (rel >= 0) & (rel < 3)
            sh = jnp.clip(rel, 0, 2) << 3
            acc = acc + jnp.where(sel[:, None, :],
                                  d[:, :, j][:, :, None] << sh[:, None, :], 0)
        u = (acc >> (o & 7)[:, None, :]) & ((1 << w)[:, None, :] - 1)
        delta = (u >> 1) ^ -(u & 1)
        out[:] = (delta + 128).astype(jnp.uint8)

    attempt("v2 u8-in u8-out", lambda: mk(
        k_v2, (dense_u8, widths, off), [spec_dense, spec_w, spec_w],
        spec_out, jax.ShapeDtypeStruct((nb, 8, D), jnp.uint8)))

    # V3: add totals output
    def k_v3(dref, wref, oref, out, tot):
        w = wref[:]
        o = oref[:]
        q = o >> 3
        d = dref[:].astype(jnp.int32)
        acc = jnp.zeros((T, 8, D), jnp.int32)
        for j in range(M):
            rel = j - q
            sel = (rel >= 0) & (rel < 3)
            sh = jnp.clip(rel, 0, 2) << 3
            acc = acc + jnp.where(sel[:, None, :],
                                  d[:, :, j][:, :, None] << sh[:, None, :], 0)
        u = (acc >> (o & 7)[:, None, :]) & ((1 << w)[:, None, :] - 1)
        delta = (u >> 1) ^ -(u & 1)
        out[:] = (delta + 128).astype(jnp.uint8)
        tot[0, 0, :] = jnp.sum(delta, axis=(0, 1), dtype=jnp.int32)

    attempt("v3 +totals", lambda: mk(
        k_v3, (dense_u8, widths, off), [spec_dense, spec_w, spec_w],
        (spec_out, spec_tot),
        (jax.ShapeDtypeStruct((nb, 8, D), jnp.uint8),
         jax.ShapeDtypeStruct((nb // T, 1, D), jnp.int32))))

    # V4: prefix_finish alone
    from sprintz_tpu.ops.pallas_decode import prefix_finish

    bz = jnp.asarray(rng.integers(0, 256, (nb * 8, D)), jnp.uint8)
    toff = jnp.zeros((nb * 8 // 256, 1, D), jnp.int32)
    attempt("v4 prefix_finish u8", lambda: prefix_finish(
        bz, toff, 8, 256, interpret=False))

    bz16 = jnp.asarray(rng.integers(0, 65536, (nb * 8, D)), jnp.uint16)
    attempt("v5 prefix_finish u16", lambda: prefix_finish(
        bz16, toff, 16, 256, interpret=False))

    # V6: full pipeline, correctness
    from sprintz_tpu.ops.pallas_decode import decode_delta_contiguous
    from sprintz_tpu.models.forecasters import delta_encode
    from sprintz_tpu.ops.bitmath import block_widths_rowmajor
    from sprintz_tpu.ops.pack import pack_rows_rowmajor

    vals = rng.integers(0, 256, (nb * 8, D)).astype(np.int64)
    rows = jnp.asarray(vals, jnp.int32)
    errs = delta_encode(rows, 8).reshape(nb, 8, D)
    w2 = block_widths_rowmajor(jnp.bitwise_or.reduce(errs, axis=1), 1)
    d2 = pack_rows_rowmajor(errs, w2, 1).astype(jnp.uint8)

    def full():
        out = decode_delta_contiguous(d2, w2, 8, block_tile=32,
                                      interpret=False)
        got = np.asarray(out).astype(np.int64)
        assert np.array_equal(got, vals), "MISMATCH"
        return out

    attempt("v6 full pipeline exact", full)


if __name__ == "__main__":
    main()
