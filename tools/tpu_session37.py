"""TPU session 37: round-4 A/Bs — wbank lowdim, d3 grouped, ngather,
xff-batch encode, windowed/fused Huffman Pallas.

Sections (env SPRINTZ_SESSION_SEC, comma list, default all, ordered so
the new Pallas kernels run LAST — a faulting kernel wedges the chip):
  lowdim   - small-d decode/encode passes: LOWDIM_IMPL einsum vs wbank
             (grouped fold), d3 legacy vs grouped-d4-fold
  runs     - runs timeline gather vs dgather vs ngather (u8 d64)
  xffbatch - batched multi-stream FIRE encode kernel (S=64)
  huff     - Huffman device decode: windowed-refill Pallas kernel,
             split (byte-LUT tail) vs in-kernel fused perm, composed e2e

Interleaved ABAB x2 per config (session-23 methodology). Every variant
is exactness-checked once before timing.

Run:  timeout 5400 python -u tools/tpu_session37.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"
SECS = os.environ.get(
    "SPRINTZ_SESSION_SEC", "lowdim,runs,xffbatch,huff").split(",")


def sec_lowdim(rng, iters):
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    shapes = [(4, 1), (3, 1), (1, 1), (2, 2)] if not SMOKE else [(3, 1)]
    for D, esz in shapes:
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = (1 << (12 if SMOKE else 23)) // esz // D
        nrows -= nrows % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
               % (1 << (8 * esz))).astype(dt)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=True)
        d2 = decoder.gather_payloads(s, idx, D, esz, True)
        if idx.total_rows != idx.widths.shape[0] * 8:
            print(f"d{D} u{8*esz}: stream has runs, skipping", flush=True)
            continue
        nd = next_bucket(d2.shape[0])
        dj = jnp.asarray(pad_rows(d2, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))

        # ---- decode pass: pass variants x unpack impls
        passes = [("grouped", "einsum"), ("grouped", "wbank"),
                  ("legacy", "einsum")]
        res = {p: [] for p in passes}
        prev_lp, prev_li = decoder.LOWDIM_PASS, pack.LOWDIM_IMPL
        try:
            for rep in range(2):
                for lp, li in passes:
                    decoder.LOWDIM_PASS = lp
                    pack.LOWDIM_IMPL = li

                    def kern(d, w):
                        return decoder._decode_pass_contiguous.__wrapped__(
                            d, w, "delta", esz, True)

                    if rep == 0:
                        out = np.asarray(kern(dj, wj))[: idx.total_rows]
                        if not np.array_equal(
                                out.reshape(-1),
                                raw.reshape(-1)[: out.size]):
                            print(f"d{D}u{8*esz} dec {lp}/{li}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (dj, wj), iters)
                    res[(lp, li)].append(raw.nbytes / t / 1e9)
        finally:
            decoder.LOWDIM_PASS, pack.LOWDIM_IMPL = prev_lp, prev_li
        for (lp, li), rs in res.items():
            print(f"d{D} u{8*esz} decode {lp:>7}/{li:<6}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)

        # ---- encode pass: encode variants x pack impls
        encs = [("grouped", "einsum"), ("grouped", "wbank"),
                ("dmajor", "einsum"), ("legacy", "einsum")]
        if D == 3:  # dmajor can't do d3; it falls to grouped anyway
            encs = [("grouped", "einsum"), ("grouped", "wbank"),
                    ("legacy", "einsum")]
        res = {p: [] for p in encs}
        rows_j = jnp.asarray(
            raw[: (nrows // 8) * 8].astype(np.int32))
        prev_le, prev_li = encoder.LOWDIM_ENCODE, pack.LOWDIM_IMPL
        ref_out = None
        try:
            for rep in range(2):
                for le, li in encs:
                    encoder.LOWDIM_ENCODE = le
                    pack.LOWDIM_IMPL = li

                    def kern(r):
                        return encoder._encode_pass.__wrapped__(
                            r, "delta", esz, True)

                    if rep == 0:
                        w_, h_, de_, ws_ = (np.asarray(x)
                                            for x in kern(rows_j))
                        # dtype/pad-insensitive: passes return widths
                        # as u8 or i32 and dense padded differently
                        sig = (w_.astype(np.int64),
                               de_.astype(np.int64)[:, :w_.shape[1]])
                        if ref_out is None:
                            ref_out = sig
                        elif not all(np.array_equal(a, b) for a, b
                                     in zip(sig, ref_out)):
                            print(f"d{D}u{8*esz} enc {le}/{li}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (rows_j,), iters)
                    res[(le, li)].append(raw.nbytes / t / 1e9)
        finally:
            encoder.LOWDIM_ENCODE, pack.LOWDIM_IMPL = prev_le, prev_li
        for (le, li), rs in res.items():
            print(f"d{D} u{8*esz} encode {le:>7}/{li:<6}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)


def sec_runs(rng, iters):
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    D = 64
    configs = [(1, 3)] if SMOKE else [(1, 3), (1, 2)]
    for esz, k in configs:
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = (1 << (10 if SMOKE else 23)) // esz // D
        seg = rng.integers(-6, 7, (nrows, D))
        m = (np.arange(nrows) // 256 % k == 0)[:, None]
        raw = (np.cumsum(np.where(m, 0, seg), axis=0)
               % (1 << (8 * esz))).astype(dt)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=False)
        d2 = decoder.gather_payloads(s, idx, D, esz, False)
        rows_pad = next_bucket(int(idx.total_rows))
        nd = next_bucket(d2.shape[0])
        orp = np.full(nd, rows_pad + 8, dtype=np.int64)
        orp[: d2.shape[0]] = idx.out_rows
        dj = jnp.asarray(pad_rows(d2, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))
        oj = jnp.asarray(orp, jnp.int32)

        modes = ("gather", "ngather", "dgather")
        results = {m_: [] for m_ in modes}
        prev = decoder.RUNS_TIMELINE
        try:
            for rep in range(2):
                for mode in modes:
                    decoder.RUNS_TIMELINE = mode

                    def kern(d, w, o):
                        return decoder._decode_pass.__wrapped__(
                            d, w, o, "delta", esz, False, rows_pad)

                    if rep == 0:
                        out = np.asarray(kern(dj, wj, oj))[: idx.total_rows]
                        if not np.array_equal(
                                out.reshape(-1),
                                raw.reshape(-1)[: out.size]):
                            print(f"u{8*esz} runs1/{k} {mode}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (dj, wj, oj), iters)
                    results[mode].append(raw.nbytes / t / 1e9)
        finally:
            decoder.RUNS_TIMELINE = prev
        for mode, rs in results.items():
            print(f"u{8*esz} runs 1/{k} {mode:>8}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)


def sec_xffbatch(rng, iters):
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import encoder

    S, nr, D = (4, 256, 16) if SMOKE else (64, 2048, 64)
    raws = (np.cumsum(rng.integers(-6, 7, (S, nr, D)), axis=1)
            % 256).astype(np.uint8)
    rows_j = jnp.asarray(raws.astype(np.int32))
    batched = jax.vmap(
        lambda r: encoder._encode_pass.__wrapped__(r, "xff", 1, False))
    # exactness: batched == per-stream
    wb, hb, db, sb = (np.asarray(x) for x in jax.jit(batched)(rows_j))
    w0, h0, d0, s0 = (np.asarray(x) for x in encoder._encode_pass(
        rows_j[0], "xff", 1, False))
    ok = (np.array_equal(wb[0], w0) and np.array_equal(db[0], d0))
    print(f"xff-batch exact vs single: {ok}", flush=True)
    for rep in range(2):
        t = devloop_time(batched, (rows_j,), max(iters // 2, 2))
        print(f"xff-batch encode kernel (S={S}): "
              f"{raws.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    # single-stream serial reference point
    single = jax.vmap(
        lambda r: encoder._encode_pass.__wrapped__(r, "xff", 1, False))
    one = jnp.asarray(raws[:1].astype(np.int32))
    t = devloop_time(single, (one,), max(iters // 2, 2))
    print(f"xff encode kernel (S=1, same shape): "
          f"{raws[0].nbytes / t / 1e9:6.2f} GB/s", flush=True)


def sec_huff(rng, iters):
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import encoder
    from sprintz_tpu.entropy import huffman as hf
    from sprintz_tpu.entropy import pallas_huffman as ph

    D = 64
    nrows = (1 << (10 if SMOKE else 23)) // D
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
           % 256).astype(np.uint8)
    stream = encoder.compress(raw.reshape(-1), D, codec="delta")
    payload = np.frombuffer(stream, np.uint8)
    cs = 128
    comp = hf.huff_compress(payload, chunk_symbols=cs, allow_stored=False)
    if len(comp) >= len(payload):
        print(f"huff: coded {len(comp)} >= raw {len(payload)} "
              "(stored escape bypassed for the A/B)", flush=True)
    words, tables, cs2, nchunks, nsym = hf.device_decode_prep(comp)
    tj = [jnp.asarray(x) for x in tables]
    wj = jnp.asarray(words)
    expect = payload

    if not ph.decode_pallas_available(words.shape[1], cs2):
        print(f"huff: pallas unavailable at C={words.shape[1]}", flush=True)
        return

    # ---- compile-only first (a faulting kernel wedges the chip)
    for fuse in (False, True):
        fn = jax.jit(lambda w, a, b, p, f=fuse: ph.decode_device_pallas(
            w, a, b, cs2, interpret=False, perm_b=p if f else None))
        t0 = time.time()
        fn.lower(wj, tj[0], tj[1], tj[2]).compile()
        print(f"huff pallas fuse={fuse}: compiled in {time.time()-t0:.0f}s",
              flush=True)

    # ---- exactness once per variant
    for fuse in (False, True):
        out = ph.decode_jax_pallas(words, tables, cs2, nchunks, nsym,
                                   interpret=False, fuse_perm=fuse)
        print(f"huff pallas fuse={fuse} exact: "
              f"{np.array_equal(out, expect)}", flush=True)

    # ---- timed: kernel alone, tail alone, composed (split vs fused)
    steps = (cs2 + 1) // 2

    def kern_split(w, a, b, p):
        packed = ph.decode_device_pallas(w, a, b, cs2, interpret=False)
        pt = packed.T
        idx = jnp.stack([pt & 255, (pt >> 8) & 255], -1).reshape(
            pt.shape[0], 2 * steps)[:, :cs2]
        return hf._byte_lookup(idx, p).astype(jnp.uint8)

    def kern_fused(w, a, b, p):
        packed = ph.decode_device_pallas(w, a, b, cs2, interpret=False,
                                         perm_b=p)
        pt = packed.T
        idx = jnp.stack([pt & 255, (pt >> 8) & 255], -1).reshape(
            pt.shape[0], 2 * steps)[:, :cs2]
        return idx.astype(jnp.uint8)

    def kern_only(w, a, b, p):
        return ph.decode_device_pallas(w, a, b, cs2, interpret=False)

    def tail_only(packed, p):
        pt = packed.T
        idx = jnp.stack([pt & 255, (pt >> 8) & 255], -1).reshape(
            pt.shape[0], 2 * steps)[:, :cs2]
        return hf._byte_lookup(idx, p).astype(jnp.uint8)

    packed_j = jnp.asarray(
        np.asarray(jax.jit(kern_only)(wj, tj[0], tj[1], tj[2])))
    variants = [("kernel", kern_only, (wj, tj[0], tj[1], tj[2])),
                ("tail(byteLUT)", tail_only, (packed_j, tj[2])),
                ("composed split", kern_split, (wj, tj[0], tj[1], tj[2])),
                ("composed fused", kern_fused, (wj, tj[0], tj[1], tj[2]))]
    for rep in range(2):
        for name, fn, args in variants:
            t = devloop_time(fn, args, max(iters // 2, 2))
            print(f"huff {name:>15}: {nsym / t / 1e9:6.2f} GB/s", flush=True)


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

    rng = np.random.default_rng(37)
    iters = 2 if SMOKE else 16
    for sec in SECS:
        print(f"==== section {sec} ====", flush=True)
        globals()[f"sec_{sec}"](rng, iters)
    print("SESSION37 DONE", flush=True)


if __name__ == "__main__":
    main()
