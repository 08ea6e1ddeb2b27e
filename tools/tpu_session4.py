"""TPU session 4: fill in the remaining device numbers. Pure XLA — no
Pallas, no fault risk (CLAUDE.md kernel-bring-up protocol).

Measurements, safest first, each exactness-checked before timing:

  1. serial FIRE unroll {32, 64, 128} — does the session-3 curve keep
     climbing past 32?
  2. xff/u16 serial kernel (missing from the context numbers)
  3. lowdim kernels: delta/u8 d4 and delta/u16 d2 (column-major layout)
  4. grouped-signature vs scatter decode A/B on a runs-containing stream
     (production picks grouped; this proves it on device)
  5. long-stream tile kernel (_decode_pass_contiguous_chunk) — the
     per-tile rate behind the >64 MiB chunked path
  6. huffman device decode probe (chunk-parallel scan) — expected to
     lose badly to host native (per-lane gathers scalarize on TPU,
     CLAUDE.md); a number either way completes VERDICT item 5

Run detached:  nohup python -u tools/tpu_session4.py > /tmp/tpu_session4.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# SPRINTZ_SESSION_SMOKE=1: tiny shapes + exactness only (CPU pre-flight)
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
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(0)

    def prep(raw, D, codec, elem_sz, lowdim):
        s = encoder.compress(raw.reshape(-1), D, codec=codec,
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, elem_sz, lowdim=lowdim)
        dense = decoder.gather_payloads(s, idx, D, elem_sz, lowdim)
        nd = next_bucket(dense.shape[0])
        dj = jnp.asarray(pad_rows(dense, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))
        return s, idx, dj, wj

    def check_time(tag, kern, args, raw, nrows, budget_iters=16):
        got = np.asarray(jax.jit(kern)(*args))
        ok = np.array_equal(got[:nrows].astype(np.int64),
                            raw.astype(np.int64))
        if SMOKE:
            print(f"{tag:44s} exact={ok}  (smoke: not timed)", flush=True)
            assert ok, tag
            return 0.0
        t = devloop_time(kern, args, budget_iters)
        print(f"{tag:44s} exact={ok}  {t * 1e6:9.1f} us  "
              f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)
        return t

    # ---- 1. serial FIRE unroll continuation ----------------------------
    D, nrows = 64, (1 << 12 if SMOKE else 1 << 17)
    raw8 = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
            ).astype(np.uint8)
    _, _, dj, wj = prep(raw8, D, "xff", 1, False)

    def kern_xff8(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "xff", 1, False)

    for unroll in ((8,) if SMOKE else (32, 64, 128)):
        fc.SCAN_UNROLL = unroll
        jax.clear_caches()
        try:
            check_time(f"xff/u8 serial[unroll={unroll}]", kern_xff8,
                       (dj, wj), raw8, nrows)
        except Exception as e:
            print(f"xff serial unroll={unroll} FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
    fc.SCAN_UNROLL = 8 if SMOKE else 32
    jax.clear_caches()

    # ---- 2. xff/u16 serial kernel --------------------------------------
    raw16 = (np.cumsum(rng.integers(-300, 301, (nrows, D)), axis=0)
             % 65536).astype(np.uint16)
    _, _, dj16, wj16 = prep(raw16, D, "xff", 2, False)

    def kern_xff16(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "xff", 2, False)

    check_time("xff/u16 serial[unroll=32]", kern_xff16, (dj16, wj16),
               raw16, nrows)

    # ---- 3. lowdim kernels ---------------------------------------------
    nrl = 1 << 13 if SMOKE else 1 << 20
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    _, _, djl, wjl = prep(rawl8, 4, "delta", 1, True)

    def kern_low8(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, True)

    check_time("delta/u8 lowdim d4", kern_low8, (djl, wjl), rawl8, nrl)

    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    _, _, djl2, wjl2 = prep(rawl16, 2, "delta", 2, True)

    def kern_low16(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 2, True)

    check_time("delta/u16 lowdim d2", kern_low16, (djl2, wjl2), rawl16, nrl)

    # ---- 4. grouped vs scatter on a runs-containing stream -------------
    # piecewise-constant stretches -> zero-run RLE blocks; per-dim delta
    # amplitudes stable within coarse epochs -> repeated width signatures
    # among data blocks (what the shape grouping exploits; real sensor
    # streams behave this way)
    epoch = np.arange(nrows) // max(nrows // 8, 1)  # 8 amplitude epochs
    # amp in {3,6,12}: zigzag(+amp) and zigzag(-amp) share a bit length,
    # so every data block in an epoch carries the same width signature
    amp = np.asarray([3, 6, 12])[
        rng.integers(0, 3, (8, D))][epoch]  # (nrows, D)
    seg = np.where(rng.integers(0, 2, (nrows, D)) == 0, -1, 1) * amp
    mask = (np.arange(nrows) // 256 % 3 == 0)[:, None]  # 1/3 rows in runs
    rawr = (np.cumsum(np.where(mask, 0, seg), axis=0) % 256).astype(np.uint8)
    sr = encoder.compress(rawr.reshape(-1), D, codec="delta", elem_sz=1)
    ngr, _, _ = read_metadata_rle(sr)
    idxr = decoder.walk_headers(sr, ngr, D, 1, lowdim=False)
    denser = decoder.gather_payloads(sr, idxr, D, 1, False)
    ndata = denser.shape[0]
    rows_pad = next_bucket(idxr.total_rows)
    print(f"runs stream: {ndata} data blocks / "
          f"{idxr.total_rows // 8} total blocks, "
          f"{len(np.unique(idxr.widths, axis=0))} unique signatures",
          flush=True)

    nd_pad = next_bucket(ndata)
    out_rows_p = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
    out_rows_p[:ndata] = idxr.out_rows
    dr = jnp.asarray(pad_rows(denser, nd_pad))
    wr = jnp.asarray(pad_rows(idxr.widths, nd_pad))
    orp = jnp.asarray(out_rows_p, jnp.int32)

    def kern_scatter(d, w, o):
        return decoder._decode_pass.__wrapped__(
            d, w, o, "delta", 1, False, rows_pad)

    check_time("delta/u8 runs scatter", kern_scatter, (dr, wr, orp),
               rawr, nrows)

    grouping = decoder.group_by_signature(idxr)
    if grouping is None:
        print("grouping declined (blowup)", flush=True)
    else:
        uniq_pad, perm = grouping
        u_pad, c_pad = perm.shape
        dense_g = np.zeros((u_pad, c_pad) + denser.shape[1:],
                           dtype=denser.dtype)
        out_rows_g = np.full((u_pad, c_pad), rows_pad + 8, dtype=np.int64)
        valid = perm >= 0
        dense_g[valid] = denser[perm[valid]]
        out_rows_g[valid] = idxr.out_rows[perm[valid]]
        dg = jnp.asarray(dense_g)
        ug = jnp.asarray(uniq_pad)
        og = jnp.asarray(out_rows_g, jnp.int32)

        def kern_grouped(d, u, o):
            return decoder._decode_pass_grouped.__wrapped__(
                d, u, o, "delta", 1, False, rows_pad)

        check_time(f"delta/u8 runs grouped (U={u_pad}, C={c_pad})",
                   kern_grouped, (dg, ug, og), rawr, nrows)

    # ---- 5. long-stream tile kernel ------------------------------------
    # the >64 MiB path decodes tiles of CHUNK_OUT_BYTES with state carry;
    # time one tile (what each host-loop dispatch costs on device)
    nrt = (1 << 13 if SMOKE else 1 << 20)  # 64 MiB tile at D=64
    rawt = (np.cumsum(rng.integers(-6, 7, (nrt, D)), axis=0) % 256
            ).astype(np.uint8)
    _, _, djt, wjt = prep(rawt, D, "delta", 1, False)
    state0 = jnp.zeros((3, D), jnp.int32)

    def kern_tile(d, w, s):
        v, ns = decoder._decode_pass_contiguous_chunk.__wrapped__(
            d, w, s, "delta", 1, False)
        return v

    check_time("delta/u8 64MiB tile kernel", kern_tile,
               (djt, wjt, state0), rawt, nrt, budget_iters=8)

    # ---- 6. huffman device decode probe --------------------------------
    from sprintz_tpu.entropy import huffman as hf

    payload = encoder.compress(raw8.reshape(-1), D, codec="delta",
                               elem_sz=1)
    hbuf = hf.huff_compress(np.frombuffer(payload, np.uint8))
    n, chunk_symbols, nchunks, t, sizes, offsets = hf._parse(hbuf)
    print(f"huffman probe: {len(payload)} bytes, {nchunks} chunks x "
          f"{chunk_symbols} syms", flush=True)
    want = np.frombuffer(payload, np.uint8)
    t0 = time.time()
    got = hf.huff_decompress(hbuf, backend="jax")
    wall = time.time() - t0
    ok = np.array_equal(got, want)
    print(f"huffman jax decode (cold, incl compile): exact={ok} "
          f"{wall:.1f}s", flush=True)
    t0 = time.time()
    got = hf.huff_decompress(hbuf, backend="jax")
    wall = time.time() - t0
    print(f"huffman jax decode (warm, e2e): {wall * 1e3:.0f} ms  "
          f"{len(payload) / wall / 1e6:.1f} MB/s "
          f"(host native: 825 MB/s)", flush=True)

    print("SESSION4 DONE", flush=True)


if __name__ == "__main__":
    main()
