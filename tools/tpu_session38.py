"""TPU session 38: round-4 A/Bs after the fine-bucket change.

Sections (env SPRINTZ_SESSION_SEC, comma list, default all; the Pallas
huff kernels run in their own section — order sections so they come
last if running multiple):
  runs     - runs timeline gather/ngather/dgather with FINE nd_pad
             buckets (s37 ran pow2: data blocks 2/3*nb padded to nb)
  lowdim   - d3/d4 decode: grouped{fold4,native} x finish{v1,v2} vs
             legacy; d3/d4 encode grouped (ragged-chunk fix) vs others
  finish   - stage isolation d4 u8: unpack alone, finish v1/v2 alone,
             full pass v1/v2
  xffs     - batched xff encode S sweep at fixed 8 MiB total
  huff     - +Huf device decode with fine nc_pad (s37: 35794 chunks
             padded to 65536 = 1.83x wasted kernel work; now 36864)

Interleaved reps, exactness-checked once per variant before timing.
Run:  timeout 5400 python -u tools/tpu_session38.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"
SECS = os.environ.get(
    "SPRINTZ_SESSION_SEC", "runs,lowdim,finish,xffs,huff").split(",")


def _mk_lowdim(rng, D, esz, nrows):
    dt = np.uint8 if esz == 1 else np.uint16
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
           % (1 << (8 * esz))).astype(dt)
    return raw


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
        print(f"u{8*esz} 1/{k}: ndata {d2.shape[0]} pad {nd} "
              f"(pow2 would be {1 << (d2.shape[0] - 1).bit_length()})",
              flush=True)
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


def sec_lowdim(rng, iters):
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    shapes = [(3, 1), (4, 1)] if not SMOKE else [(3, 1)]
    for D, esz in shapes:
        nrows = (1 << (12 if SMOKE else 23)) // esz // D
        nrows -= nrows % 8
        raw = _mk_lowdim(rng, D, esz, nrows)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=True)
        d2 = decoder.gather_payloads(s, idx, D, esz, True)
        if idx.total_rows != idx.widths.shape[0] * 8:
            print(f"d{D} u{8*esz}: stream has runs, skipping", flush=True)
            continue
        nd = next_bucket(d2.shape[0])
        print(f"d{D}: nb {d2.shape[0]} pad {nd}", flush=True)
        dj = jnp.asarray(pad_rows(d2, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))

        # decode: (pass, d3mode, finish)
        passes = [("grouped", "fold4", "v1"), ("grouped", "fold4", "v2"),
                  ("legacy", "fold4", "v1")]
        if D == 3:
            passes.insert(2, ("grouped", "native", "v2"))
            passes.insert(2, ("grouped", "native", "v1"))
        res = {p: [] for p in passes}
        prev = (decoder.LOWDIM_PASS, decoder.LOWDIM_D3, pack.LOWDIM_D3,
                decoder.GROUPED_FINISH)
        try:
            for rep in range(2):
                for lp, d3m, fin in passes:
                    decoder.LOWDIM_PASS = lp
                    decoder.LOWDIM_D3 = pack.LOWDIM_D3 = d3m
                    decoder.GROUPED_FINISH = fin

                    def kern(d, w):
                        return decoder._decode_pass_contiguous.__wrapped__(
                            d, w, "delta", esz, True)

                    if rep == 0:
                        out = np.asarray(kern(dj, wj))[: idx.total_rows]
                        if not np.array_equal(
                                out.reshape(-1),
                                raw.reshape(-1)[: out.size]):
                            print(f"d{D} dec {lp}/{d3m}/{fin}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (dj, wj), iters)
                    res[(lp, d3m, fin)].append(raw.nbytes / t / 1e9)
        finally:
            (decoder.LOWDIM_PASS, decoder.LOWDIM_D3, pack.LOWDIM_D3,
             decoder.GROUPED_FINISH) = prev
        for (lp, d3m, fin), rs in res.items():
            print(f"d{D} u{8*esz} dec {lp:>7}/{d3m:>6}/{fin}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)

        # encode: grouped (ragged fix) vs dmajor(d4)/legacy
        encs = [("grouped",), ("legacy",)]
        if D == 4:
            encs.insert(1, ("dmajor",))
        res = {e: [] for e in encs}
        rows_j = jnp.asarray(raw.astype(np.int32))
        prev_le = encoder.LOWDIM_ENCODE
        ref_sig = None
        try:
            for rep in range(2):
                for (le,) in encs:
                    encoder.LOWDIM_ENCODE = le

                    def kern(r):
                        return encoder._encode_pass.__wrapped__(
                            r, "delta", esz, True)

                    if rep == 0:
                        w_, h_, de_, ws_ = (np.asarray(x)
                                            for x in kern(rows_j))
                        sig = (w_.astype(np.int64),
                               de_.astype(np.int64)[:, :w_.shape[1]])
                        if ref_sig is None:
                            ref_sig = sig
                        elif not all(np.array_equal(a, b) for a, b
                                     in zip(sig, ref_sig)):
                            print(f"d{D} enc {le}: NOT EXACT", flush=True)
                            continue
                    t = devloop_time(kern, (rows_j,), iters)
                    res[(le,)].append(raw.nbytes / t / 1e9)
        finally:
            encoder.LOWDIM_ENCODE = prev_le
        for (le,), rs in res.items():
            print(f"d{D} u{8*esz} enc {le:>7}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)


def sec_finish(rng, iters):
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder
    from sprintz_tpu.ops import pack

    D, esz, eb = 4, 1, 8
    g = pack.lowdim_group(D)  # 32
    c = 1 << (4 if SMOKE else 13)  # 8192 chunks = 8 MiB of rows
    deltas = jnp.asarray(
        rng.integers(-40, 41, (c, 8, g * D)), jnp.int32)
    dense = jnp.asarray(
        rng.integers(0, 256, (c * g, D, eb)), jnp.int32)
    widths = jnp.asarray(rng.integers(0, 9, (c * g, D)), jnp.int32)
    nbytes = c * g * 8 * D * esz

    def unpack_only(d, w):
        return pack.unpack_dims_lowdim(
            d.reshape(c, g * D, eb), w.reshape(c, g * D))

    def fin(v):
        def f(dl):
            prev = decoder.GROUPED_FINISH
            decoder.GROUPED_FINISH = v
            try:
                return decoder._grouped_prefix_finish(dl, esz, D, 42, None)[0]
            finally:
                decoder.GROUPED_FINISH = prev
        return f

    # exactness: v1 == v2
    a = np.asarray(jax.jit(fin("v1"))(deltas))
    b = np.asarray(jax.jit(fin("v2"))(deltas))
    print(f"finish v1==v2: {np.array_equal(a, b)}", flush=True)

    for rep in range(2):
        for name, f, args in [("unpack", unpack_only, (dense, widths)),
                              ("finish v1", fin("v1"), (deltas,)),
                              ("finish v2", fin("v2"), (deltas,))]:
            t = devloop_time(f, args, iters)
            print(f"d4 stage {name:>9}: {nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)


def sec_xffs(rng, iters):
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import encoder

    D = 64
    cfgs = [(4, 256)] if SMOKE else [(64, 2048), (128, 1024), (256, 512),
                                     (512, 256)]
    for S, nr in cfgs:
        raws = (np.cumsum(rng.integers(-6, 7, (S, nr, D)), axis=1)
                % 256).astype(np.uint8)
        rows_j = jnp.asarray(raws.astype(np.int32))
        batched = jax.vmap(
            lambda r: encoder._encode_pass.__wrapped__(r, "xff", 1, False))
        wb, hb, db, sb = (np.asarray(x) for x in jax.jit(batched)(rows_j))
        w0, h0, d0, s0 = (np.asarray(x) for x in encoder._encode_pass(
            rows_j[0], "xff", 1, False))
        ok = (np.array_equal(wb[0], w0) and np.array_equal(db[0], d0))
        for rep in range(2):
            t = devloop_time(batched, (rows_j,), max(iters // 2, 2))
            print(f"xff-batch enc S={S:>3} nr={nr:>4} (exact={ok}): "
                  f"{raws.nbytes / t / 1e9:6.2f} GB/s", flush=True)


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
    words, tables, cs2, nchunks, nsym = hf.device_decode_prep(comp)
    print(f"huff: nchunks {nchunks} padded {words.shape[1]} "
          f"(pow2 would be {1 << (nchunks - 1).bit_length()})", flush=True)
    tj = [jnp.asarray(x) for x in tables]
    wj = jnp.asarray(words)

    if not ph.decode_pallas_available(words.shape[1], cs2):
        print(f"huff: pallas unavailable at C={words.shape[1]}", flush=True)
        return

    for fuse in (False, True):
        fn = jax.jit(lambda w, a, b, p, f=fuse: ph.decode_device_pallas(
            w, a, b, cs2, interpret=False, perm_b=p if f else None))
        t0 = time.time()
        fn.lower(wj, tj[0], tj[1], tj[2]).compile()
        print(f"huff pallas fuse={fuse}: compiled in {time.time()-t0:.0f}s",
              flush=True)
    for fuse in (False, True):
        out = ph.decode_jax_pallas(words, tables, cs2, nchunks, nsym,
                                   interpret=False, fuse_perm=fuse)
        print(f"huff pallas fuse={fuse} exact: "
              f"{np.array_equal(out, payload)}", flush=True)

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

    for rep in range(2):
        for name, fn in [("composed split", kern_split),
                         ("composed fused", kern_fused)]:
            t = devloop_time(fn, (wj, tj[0], tj[1], tj[2]),
                             max(iters // 2, 2))
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

    rng = np.random.default_rng(38)
    iters = 2 if SMOKE else 16
    for sec in SECS:
        print(f"==== section {sec} ====", flush=True)
        globals()[f"sec_{sec}"](rng, iters)
    print("SESSION38 DONE", flush=True)


if __name__ == "__main__":
    main()
