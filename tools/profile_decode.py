"""On-chip profiling: where does decode time go, and what is the chip's
real ceiling through this environment?

Run on the real TPU:  python tools/profile_decode.py
Each stage is timed with bench.devloop_time (hoisting-proof on-device
loop). Prints one line per experiment to stdout.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import devloop_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # warmup
    _ = devloop_time(lambda x: x + 1, (jnp.zeros((128, 128), jnp.int32),), 4)

    results = {}

    def report(name, t, nbytes):
        gbps = nbytes / t / 1e9
        results[name] = gbps
        print(f"{name:40s} {t * 1e6:10.1f} us  {gbps:8.2f} GB/s", flush=True)

    # --- ceilings (chain mode: zero-overhead, DCE-proof) -------------
    for mib in (8, 64):
        n = mib << 20
        x = jnp.zeros((n // 4 // 128, 128), jnp.int32)
        t = devloop_time(lambda a: a + 1, (x,), 32, chain=True)
        report(f"x_plus_1_int32_{mib}MiB", t, n)

    x8 = jnp.zeros((8 << 20 >> 7, 128), jnp.uint8)  # 8 MiB u8
    t = devloop_time(lambda a: a ^ jnp.uint8(1), (x8,), 32, chain=True)
    report("xor_u8_8MiB", t, 8 << 20)

    # u8 -> int32 conversion (decode's first op)
    t = devloop_time(
        lambda a: (a.astype(jnp.int32) + 1).astype(jnp.uint8), (x8,), 32,
        chain=True)
    report("u8_to_i32_u8_8MiB", t, 8 << 20)

    # matmul TFLOPs sanity
    a = jnp.ones((4096, 4096), jnp.bfloat16) * 1e-3
    b = jnp.ones((4096, 4096), jnp.bfloat16) * 1e-3
    t = devloop_time(
        lambda a, b: jax.lax.dot(
            a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        (a, b), 32, chain=True)
    print(f"{'matmul_4096_bf16':40s} {t * 1e6:10.1f} us  "
          f"{2 * 4096**3 / t / 1e12:8.2f} TFLOP/s", flush=True)

    # --- decode stage breakdown (u8 delta d64, 8 MiB) ----------------
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.models.forecasters import hierarchical_cumsum
    from sprintz_tpu.ops.bitmath import zigzag_decode
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)
    ndims = 64
    nrows = 1 << 17
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0) % 256
           ).astype(np.uint8)
    flat = raw.reshape(-1)
    nbytes = flat.nbytes

    t0 = time.perf_counter()
    stream = encoder.compress(flat, ndims, codec="delta")
    print(f"encode e2e host: {time.perf_counter() - t0:.3f}s "
          f"ratio {nbytes / len(stream):.2f}", flush=True)

    ngroups, _, _ = read_metadata_rle(stream)
    idx = decoder.walk_headers(stream, ngroups, ndims, 1, lowdim=False)
    dense = decoder.gather_payloads(stream, idx, ndims, 1, False)
    ndata = idx.widths.shape[0]
    print(f"ndata={ndata} dense={dense.shape} "
          f"payload={dense.nbytes / 1e6:.1f}MB", flush=True)

    rows_pad = next_bucket(idx.total_rows)
    nd_pad = next_bucket(ndata)
    out_rows = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows[:ndata] = idx.out_rows
    dense_j = jnp.asarray(pad_rows(dense, nd_pad))
    widths_j = jnp.asarray(pad_rows(idx.widths, nd_pad))
    out_rows_j = jnp.asarray(out_rows, jnp.int32)

    # full general pass
    def full_pass(d, w, o):
        return decoder._decode_pass.__wrapped__(
            d, w, o, "delta", 1, False, rows_pad)

    t = devloop_time(full_pass, (dense_j, widths_j, out_rows_j), 16)
    report("full_decode_pass_general", t, nbytes)

    # grouped pass (what production uses here)
    grouping = decoder.group_by_signature(idx)
    if grouping is not None:
        uniq_pad, perm = grouping
        u_pad, c_pad = perm.shape
        print(f"signature groups U={np.count_nonzero(uniq_pad.sum(1))} "
              f"u_pad={u_pad} c_pad={c_pad}", flush=True)
        dense_g = np.zeros((u_pad, c_pad) + dense.shape[1:], dense.dtype)
        org = np.full((u_pad, c_pad), rows_pad + 8, dtype=np.int64)
        valid = perm >= 0
        dense_g[valid] = dense[perm[valid]]
        org[valid] = idx.out_rows[perm[valid]]
        dg, wg, og = (jnp.asarray(dense_g), jnp.asarray(uniq_pad),
                      jnp.asarray(org, jnp.int32))

        def grouped_pass(d, w, o):
            return decoder._decode_pass_grouped.__wrapped__(
                d, w, o, "delta", 1, False, rows_pad)

        t = devloop_time(grouped_pass, (dg, wg, og), 16)
        report("full_decode_pass_grouped", t, nbytes)

    # stage: unpack only (matmul+shift+mask)
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor

    def unpack_only(d, w):
        return unpack_rows_rowmajor(d.astype(jnp.int32), w.astype(jnp.int32))

    t = devloop_time(unpack_only, (dense_j, widths_j), 16)
    report("stage_unpack_matmul", t, nbytes)

    # stage: scatter only
    errs = jnp.zeros((nd_pad, 8, ndims), jnp.int32)

    def scatter_only(e, o):
        full = jnp.zeros((rows_pad, ndims), jnp.int32)
        row_idx = (o[:, None] + jnp.arange(8)[None, :]).reshape(-1)
        return full.at[row_idx].set(e.reshape(-1, ndims), mode="drop")

    t = devloop_time(scatter_only, (errs, out_rows_j), 16)
    report("stage_scatter", t, nbytes)

    # stage: zigzag + cumsum only
    full = jnp.zeros((rows_pad, ndims), jnp.int32)

    def cumsum_only(f):
        return hierarchical_cumsum(zigzag_decode(f, 8), value_bits=8) & 0xFF

    t = devloop_time(cumsum_only, (full,), 16)
    report("stage_zigzag_cumsum", t, nbytes)

    # stage: contiguous variant — reshape instead of scatter
    def contiguous_decode(d, w):
        errs = unpack_rows_rowmajor(d.astype(jnp.int32), w.astype(jnp.int32))
        flat_e = errs.reshape(-1, ndims)
        vals = hierarchical_cumsum(
            zigzag_decode(flat_e, 8), value_bits=8) & 0xFF
        return vals.astype(jnp.uint8)

    t = devloop_time(contiguous_decode, (dense_j, widths_j), 16)
    report("contiguous_decode_noscatter", t, nbytes)

    print("\nsummary:", {k: round(v, 2) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
