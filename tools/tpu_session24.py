"""TPU session 24: round-3 kernel A/Bs.

Order (bench first, riskier last; everything is plain XLA — no Pallas):
 1. Huffman device decode chunk-size sweep (VERDICT r3 item 1 target:
    >= 5 GB/s) + device encode (item 8 target: >= 2 GB/s), exactness
    checked once per config on device.
 2. Ragged-dot unpack A/B vs the production contiguous pass (item 5a)
    and vs the runs-stream gather pass (item 6).
 3. Lowdim xff decode/encode with the grouped pack/unpack (item 3),
    lowdim delta alongside for the within-2x check.

Run:  timeout 4800 python -u tools/tpu_session24.py
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
    from sprintz_tpu.entropy import huffman as hf
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(3)
    D = 64
    nrows = 1 << (10 if SMOKE else 17)  # 8 MiB u8 d64
    iters = 2 if SMOKE else 16

    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    flat = raw.reshape(-1)
    stream = encoder.compress(flat, D, codec="delta")
    payload = np.frombuffer(stream, np.uint8)
    nsym = payload.size
    print(f"sprintz stream: {nsym / 2**20:.2f} MiB", flush=True)

    # ---------------- 1a. huffman device decode, chunk-size sweep
    dec = hf.get_decode_device()
    for cs in ([64] if SMOKE else [64, 128, 256, 512]):
        comp = hf.huff_compress(payload, chunk_symbols=cs)
        words, tables, _, nchunks, n = hf.device_decode_prep(comp)
        tj = [jnp.asarray(x) for x in tables]
        wj = jnp.asarray(words)
        out = np.asarray(dec(wj, *tj, cs))
        ok = np.array_equal(out[:nchunks].reshape(-1)[:n], payload)
        t = devloop_time(lambda w, a, b, c: dec(w, a, b, c, cs),
                         (wj, tj[0], tj[1], tj[2]), iters)
        print(f"huff-dec cs={cs:4d} C={nchunks:6d} W32={words.shape[0]:4d}: "
              f"{nsym / t / 1e9:6.2f} GB/s exact={ok} "
              f"(+Huf ratio {nsym / len(comp):.3f})", flush=True)

    # ---------------- 1b. huffman device encode
    enc = hf.get_encode_device()
    for cs in ([64] if SMOKE else [128, 512]):
        ref = hf.huff_compress(payload, chunk_symbols=cs)
        dev = hf.huff_compress_device(payload, chunk_symbols=cs)
        ok = dev == ref
        t = hf.build_table(payload)
        nch = max(1, -(-nsym // cs))
        syms = np.full((next_bucket(nch, 8), cs), 256, np.int32)
        syms.reshape(-1)[:nsym] = payload
        tt = devloop_time(
            enc, (jnp.asarray(syms), jnp.asarray(hf.encode_lut_packed(t))),
            iters)
        print(f"huff-enc cs={cs:4d}: {nsym / tt / 1e9:6.2f} GB/s "
              f"byte-identical={ok}", flush=True)

    # ---------------- 2. ragged A/B: contiguous headline + runs stream
    def build_rowmajor(kind):
        seg = rng.integers(-6, 7, (nrows, D))
        if kind == "runs":
            seg[(np.arange(nrows) // 256 % 3 == 0)] = 0
        r = (np.cumsum(seg, axis=0) % 256).astype(np.uint8)
        s = encoder.compress(r.reshape(-1), D, codec="delta")
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, 1, lowdim=False)
        d = decoder.gather_payloads(s, idx, D, 1, False)
        return r, s, idx, d

    for kind in ("contig", "runs"):
        r, s, idx, d = build_rowmajor(kind)
        ndata = idx.widths.shape[0]
        nd_pad = next_bucket(ndata)
        rows_pad = next_bucket(idx.total_rows)
        # baseline: production pass
        if kind == "contig":
            dj = jnp.asarray(pad_rows(d, nd_pad))
            wjj = jnp.asarray(pad_rows(idx.widths, nd_pad))

            def base_kern(a, b):
                return decoder._decode_pass_contiguous.__wrapped__(
                    a, b, "delta", 1, False)

            tb = devloop_time(base_kern, (dj, wjj), iters)
        else:
            orp = np.full(nd_pad, rows_pad + 8, np.int64)
            orp[:ndata] = idx.out_rows
            dj = jnp.asarray(pad_rows(d, nd_pad))
            wjj = jnp.asarray(pad_rows(idx.widths, nd_pad))
            oj = jnp.asarray(orp, jnp.int32)

            def base_kern(a, b, c):
                return decoder._decode_pass.__wrapped__(
                    a, b, c, "delta", 1, False, rows_pad)

            tb = devloop_time(base_kern, (dj, wjj, oj), iters)
        # ragged
        order, widths_u, gs, U = decoder.ragged_order(idx.widths)
        gs[U] += nd_pad - ndata
        dense_s = np.zeros((nd_pad,) + d.shape[1:], d.dtype)
        dense_s[:ndata] = d[order]
        widths_s = np.zeros((nd_pad, D), np.int32)
        widths_s[:ndata] = idx.widths[order]
        ors = np.full(nd_pad, rows_pad + 8, np.int64)
        ors[:ndata] = idx.out_rows[order]

        def rag_kern(a, b, c, g, o):
            return decoder._decode_pass_ragged.__wrapped__(
                a, b, c, g, o, "delta", 1, rows_pad)

        args = (jnp.asarray(dense_s), jnp.asarray(widths_s),
                jnp.asarray(widths_u), jnp.asarray(gs),
                jnp.asarray(ors, jnp.int32))
        outr = np.asarray(rag_kern(*args))[: idx.total_rows]
        ok = np.array_equal(outr.reshape(-1)[: r.size - 128 * D],
                            r.reshape(-1)[: r.size - 128 * D]) if not SMOKE \
            else True
        tr = devloop_time(rag_kern, args, iters)
        print(f"ragged A/B {kind}: base {r.nbytes / tb / 1e9:6.2f} GB/s | "
              f"ragged {r.nbytes / tr / 1e9:6.2f} GB/s (U={U}) exact={ok}",
              flush=True)

    # ---------------- 3. lowdim xff vs delta (grouped pack/unpack)
    for codec in ("delta", "xff"):
        for dd, esz in [(4, 1), (2, 2)]:
            dt = np.uint8 if esz == 1 else np.uint16
            nr = (1 << (10 if SMOKE else 20)) // esz
            r = (np.cumsum(rng.integers(-6, 7, (nr, dd)), axis=0)
                 % (1 << (8 * esz))).astype(dt)
            s = encoder.compress(r.reshape(-1), dd, codec=codec)
            ng, _, _ = read_metadata_rle(s)
            idx = decoder.walk_headers(s, ng, dd, esz, lowdim=True)
            if idx.total_rows != idx.widths.shape[0] * 8:
                print(f"lowdim {codec} d{dd} u{8*esz}: stream has runs, "
                      "skipping", flush=True)
                continue
            d = decoder.gather_payloads(s, idx, dd, esz, True)
            nd_pad = next_bucket(d.shape[0])
            dj = jnp.asarray(pad_rows(d, nd_pad))
            wjj = jnp.asarray(pad_rows(idx.widths, nd_pad))

            def kern(a, b):
                return decoder._decode_pass_contiguous.__wrapped__(
                    a, b, codec, esz, True)

            outv = np.asarray(kern(dj, wjj))[: idx.total_rows]
            nb_tail = idx.total_rows * dd
            ok = np.array_equal(outv.reshape(-1)[:nb_tail],
                                r.reshape(-1)[:nb_tail])
            t = devloop_time(kern, (dj, wjj), iters)
            # encode pass
            rows_j = jnp.asarray(pad_rows(
                r[: (nr // 8) * 8].astype(np.int32), next_bucket(nr)))

            def ekern(rr):
                return encoder._encode_pass.__wrapped__(
                    rr, codec, esz, True)

            te = devloop_time(ekern, (rows_j,), iters)
            print(f"lowdim {codec} d{dd} u{8*esz}: decode "
                  f"{r.nbytes / t / 1e9:5.2f} GB/s exact={ok} | encode "
                  f"{r.nbytes / te / 1e9:5.2f} GB/s", flush=True)

    print("SESSION24 DONE", flush=True)


if __name__ == "__main__":
    main()
