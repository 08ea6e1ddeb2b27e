"""Localize the session-4 runs-stream device mismatch.

Artifacts from a CPU process: /tmp/runs_rawr.npy (131072, 64) u8 and
/tmp/runs_stream_cpu.bin (CPU-encoded delta stream, exact on CPU).

Probes, in order:
  1. device ENCODE of rawr -> byte-compare vs the CPU stream
     (session 4 encoded on-device; a wrong stream would make both
     decode paths read as inexact)
  2. device decode of the CPU stream, scatter path -> compare vs rawr;
     report the mismatch pattern (first bad row, count, run-region
     alignment)
  3. scatter-only probe: return the scattered error timeline (before
     the prefix sum) -> compare vs host-computed zigzag timeline
  4. prefix-impl A/B: repeat probe 2 with PREFIX_IMPL="bf16"

Run detached:  nohup python -u tools/tpu_debug_runs.py > /tmp/tpu_debug_runs.log 2>&1 &
"""

from __future__ import annotations

import functools
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

    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rawr = np.load("/tmp/runs_rawr.npy")
    cpu_stream = open("/tmp/runs_stream_cpu.bin", "rb").read()
    nrows, D = rawr.shape

    # ---- 1. device encode byte-compare --------------------------------
    dev_stream = encoder.compress(rawr.reshape(-1), D, codec="delta",
                                  elem_sz=1)
    if dev_stream == cpu_stream:
        print("probe1: device encode == cpu encode (stream identical)",
              flush=True)
    else:
        a = np.frombuffer(dev_stream, np.uint8)
        b = np.frombuffer(cpu_stream, np.uint8)
        n = min(len(a), len(b))
        bad = np.nonzero(a[:n] != b[:n])[0]
        print(f"probe1: DEVICE ENCODE DIFFERS: lens {len(a)} vs {len(b)}, "
              f"{bad.size} mismatched bytes, first at {bad[0] if bad.size else '-'}",
              flush=True)

    # ---- host walk/gather of the CPU stream ---------------------------
    ng, _, _ = read_metadata_rle(cpu_stream)
    idx = decoder.walk_headers(cpu_stream, ng, D, 1, lowdim=False)
    dense = decoder.gather_payloads(cpu_stream, idx, D, 1, False)
    ndata = dense.shape[0]
    rows_pad = next_bucket(idx.total_rows)
    nd_pad = next_bucket(ndata)
    out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows_p[:ndata] = idx.out_rows
    dj = jnp.asarray(pad_rows(dense, nd_pad))
    wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
    oj = jnp.asarray(out_rows_p, jnp.int32)

    def describe(tag, got):
        ok = np.array_equal(got[:nrows].astype(np.int64),
                            rawr.astype(np.int64))
        if ok:
            print(f"{tag}: exact", flush=True)
            return
        bad = np.nonzero((got[:nrows] != rawr).any(axis=1))[0]
        in_run = (bad // 256 % 3 == 0)
        print(f"{tag}: WRONG — {bad.size}/{nrows} bad rows, first {bad[0]}, "
              f"last {bad[-1]}, {int(in_run.sum())} in run regions",
              flush=True)
        r = int(bad[0])
        d = int(np.nonzero(got[r] != rawr[r])[0][0])
        print(f"   first bad: row {r} dim {d}: got {got[r, d]} "
              f"want {rawr[r, d]}", flush=True)

    # ---- 2. scatter decode of the CPU stream --------------------------
    @functools.partial(jax.jit, static_argnames=("total_rows",))
    def scatter_decode(d, w, o, total_rows):
        return decoder._decode_pass.__wrapped__(
            d, w, o, "delta", 1, False, total_rows)

    got = np.asarray(scatter_decode(dj, wj, oj, rows_pad))
    describe("probe2 scatter decode(cpu stream)", got)

    # ---- 3. scatter-only probe ----------------------------------------
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor

    @functools.partial(jax.jit, static_argnames=("total_rows",))
    def scatter_only(d, w, o, total_rows):
        errs = unpack_rows_rowmajor(d.astype(jnp.int32),
                                    w.astype(jnp.int32))
        nb = errs.shape[0]
        full = jnp.zeros((total_rows, errs.shape[2]), jnp.int32)
        ridx = (o[:, None] + jnp.arange(8)[None, :]).reshape(-1)
        return full.at[ridx].set(errs.reshape(nb * 8, -1), mode="drop")

    timeline = np.asarray(scatter_only(dj, wj, oj, rows_pad))
    deltas = (rawr.astype(np.int64)
              - np.vstack([np.zeros((1, D), np.int64),
                           rawr[:-1].astype(np.int64)])) % 256
    d8 = deltas.astype(np.uint8).view(np.int8).astype(np.int64)
    expect = np.where(d8 >= 0, 2 * d8, -2 * d8 - 1)
    # blocks beyond the packed region (verbatim tail) hold zeros
    nb_cov = idx.total_rows
    ok = np.array_equal(timeline[:nb_cov], expect[:nb_cov])
    if ok:
        print("probe3 scatter-only timeline: exact", flush=True)
    else:
        bad = np.nonzero((timeline[:nb_cov] != expect[:nb_cov]).any(axis=1))[0]
        r = int(bad[0])
        d = int(np.nonzero(timeline[r] != expect[r])[0][0])
        print(f"probe3 scatter-only: WRONG — {bad.size} bad rows, "
              f"first row {r} dim {d}: got {timeline[r, d]} want {expect[r, d]} "
              f"(width {idx.widths[np.searchsorted(idx.out_rows, r, 'right') - 1, d] if ndata else '?'})",
              flush=True)

    # ---- 4. prefix impl A/B -------------------------------------------
    old = fc.PREFIX_IMPL
    fc.PREFIX_IMPL = "bf16"
    jax.clear_caches()
    got = np.asarray(scatter_decode(dj, wj, oj, rows_pad))
    describe("probe4 scatter decode PREFIX_IMPL=bf16", got)
    fc.PREFIX_IMPL = old
    jax.clear_caches()

    print("DEBUG_RUNS DONE", flush=True)


if __name__ == "__main__":
    main()
