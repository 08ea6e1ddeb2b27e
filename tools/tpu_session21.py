"""TPU session 21: headline maxb-granularity A/B + u16 xff-par + encode variants.

1. maxb A/B. The unpack weight tensor (c, D, maxb) bf16 dominates the
   headline decode's HBM traffic (docs/STATUS.md speed-of-light: ~64 MB
   of ~130 MB at maxb=64). gather_payloads buckets maxb by POWERS OF TWO
   (decoder.py:662), so the 8 MiB headline stream (rb_max ~ 40 bytes)
   lands right back on maxb=64 — the bucketing saves nothing there.
   A/B the contiguous decode at maxb in {mult-8(rb_max), 48, 64}; if the
   finer buckets win, switch the maxb rule to multiples of 8.
2. xff sidecar chunk-parallel decode at u16 (production path measured
   only at u8 so far; sessions 2/19 cover u8).
3. Encode-kernel variants with no device number yet: xff/u8 (serial FIRE
   scan pack) and delta/u16 (two-plane widths/pack).

All passes are plain XLA (no Pallas) — no fault risk; exactness is
checked on-device for items 1 and 2 before timing.

Run detached:  nohup python -u tools/tpu_session21.py > /tmp/tpu_session21.log 2>&1 &
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
    from sprintz_tpu import checkpoint, decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)
    D = 64
    iters = 4 if SMOKE else 32

    # ---- 1. maxb granularity A/B on the headline config ----
    nrows = 1 << (12 if SMOKE else 17)  # 8 MiB u8 d64
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    flat = raw.reshape(-1)
    stream = encoder.compress(flat, D, codec="delta")
    ng, _, _ = read_metadata_rle(stream)
    idx = decoder.walk_headers(stream, ng, D, 1, lowdim=False)
    dense = decoder.gather_payloads(stream, idx, D, 1, False)
    assert idx.total_rows == idx.widths.shape[0] * 8, "runs: wrong stream"
    rb_max = int((idx.widths.sum(axis=1).max() + 7) // 8)
    rb8 = (rb_max + 7) // 8 * 8
    print(f"headline stream: rb_max={rb_max} bytes -> mult8 {rb8}; "
          f"production maxb={dense.shape[2]}", flush=True)
    nd_pad = next_bucket(dense.shape[0])
    dense64 = pad_rows(
        np.pad(dense, ((0, 0), (0, 0), (0, 64 - dense.shape[2]))), nd_pad)
    widths_j = jnp.asarray(pad_rows(idx.widths, nd_pad))
    for maxb in sorted({rb8, 48, 64}):
        if maxb < rb_max:
            continue
        dj = jnp.asarray(dense64[:, :, :maxb])

        def kern(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", 1, False)

        out = np.asarray(kern(dj, widths_j))[:nrows]
        ok = np.array_equal(out.reshape(-1), flat)
        if SMOKE:
            print(f"  maxb={maxb}: exact={ok} (smoke)", flush=True)
            assert ok, maxb
            continue
        t = devloop_time(kern, (dj, widths_j), iters)
        print(f"  maxb={maxb:3d}: exact={ok}  {t * 1e6:9.1f} us  "
              f"{flat.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    # ---- 2. xff sidecar chunk-parallel decode, u16 ----
    nrows2 = 1 << (12 if SMOKE else 16)  # 8 MiB u16 d64
    raw2 = (np.cumsum(rng.integers(-40, 41, (nrows2, D)), axis=0)
            % 65536).astype(np.uint16)
    s2, sc = checkpoint.compress_with_sidecar(
        raw2.reshape(-1), D, codec="xff",
        every_groups=16 if SMOKE else 64)
    out2 = checkpoint.decompress_parallel(s2, sc)
    ok2 = np.array_equal(out2, raw2.reshape(-1))
    print(f"xff-par u16: parallel-decode exact={ok2}", flush=True)
    assert ok2
    ng2, _, _ = read_metadata_rle(s2)
    idx2 = decoder.walk_headers(s2, ng2, D, 2, lowdim=False)
    d2 = decoder.gather_payloads(s2, idx2, D, 2, False)
    if idx2.total_rows == idx2.widths.shape[0] * 8 and not SMOKE:
        C = len(sc.byte_offsets)
        cob = (np.searchsorted(sc.byte_offsets, idx2.payload_offsets,
                               side="right") - 1)
        counts = np.bincount(cob, minlength=C)
        nb_pad = next_bucket(int(counts.max()))
        dense_c = np.zeros((C, nb_pad) + d2.shape[1:], np.uint8)
        widths_c = np.zeros((C, nb_pad, D), np.int32)
        order = np.argsort(cob, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])
        for c in range(C):
            seg = order[starts[c]: starts[c + 1]]
            dense_c[c, : len(seg)] = d2[seg]
            widths_c[c, : len(seg)] = idx2.widths[seg]
        states = np.zeros((C, 3, D), np.int32)
        states[:, : sc.states.shape[1]] = sc.states
        lr = jnp.zeros((C, nb_pad), jnp.int32)

        def kern2(d, w, s):
            return decoder._decode_pass_chunks.__wrapped__(
                d, w, lr, s, "xff", 2, False, nb_pad * 8, True)

        t2 = devloop_time(
            kern2, (jnp.asarray(dense_c), jnp.asarray(widths_c),
                    jnp.asarray(states)), 16)
        print(f"xff-par/u16 kernel ({C} chunks): {t2 * 1e6:9.1f} us  "
              f"{raw2.nbytes / t2 / 1e9:6.2f} GB/s", flush=True)

    # ---- 3. encode kernel variants ----
    def enc_kernel(raw_n, codec, elem_sz, label):
        rows_j = jnp.asarray(raw_n.astype(np.int32))

        def kern(r):
            return encoder._encode_pass.__wrapped__(r, codec, elem_sz, False)

        if SMOKE:
            jax.block_until_ready(kern(rows_j))
            print(f"  encode {label}: ran (smoke)", flush=True)
            return
        t = devloop_time(kern, (rows_j,), iters)
        print(f"  encode kernel {label}: {t * 1e6:9.1f} us  "
              f"{raw_n.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    enc_kernel(raw, "xff", 1, "xff/u8 d64")
    enc_kernel(raw2, "delta", 2, "delta/u16 d64")
    enc_kernel(raw2, "xff", 2, "xff/u16 d64")

    print("SESSION21 DONE", flush=True)


if __name__ == "__main__":
    main()
