"""TPU session 53: prefix-chunk re-tune + inherited-win re-measures.

Session 52 set UNPACK_NWIN=auto (2 byte windows at u8), lifting the
headline 23.0 -> 24.9. The remaining 8 MiB knob untouched since round 2
is the hierarchical-cumsum chunk (256, tuned pre-flat-params).

A. u8 d64 full pass, prefix chunk in {128, 256, 512} (x2 interleaved);
   u16 d64 chunk {256, 512}.
B. Re-measure rows that inherit the 2-window unpack: runs-stream u8,
   query compact sum, xff-par u8, and the 64 MiB tiled kernel leg the
   composed row uses.

Run:  timeout 5400 python -u tools/tpu_session53.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _eq(a, b) -> bool:
    import jax
    import jax.numpy as jnp

    return bool(jax.jit(jnp.array_equal)(a, b))


def main():
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import checkpoint, decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.models import forecasters as fc
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(53)

    def prep_flat(raw, ndims, elem_sz, runs=False):
        s = encoder.compress(raw.reshape(-1), ndims, codec="delta",
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, ndims, elem_sz, lowdim=False)
        dense = decoder.gather_payloads(s, idx, ndims, elem_sz, False)
        nd = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd)
        wp = pad_rows(idx.widths, nd)
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        return s, idx, dfl, wfl, nd, dp.shape[2]

    def set_prefix_chunk(c):
        fc.hierarchical_cumsum.__defaults__ = (c, 16)
        jax.clear_caches()

    # ---------------- Part A: prefix chunk ----------------
    nr = 1 << 17
    raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
           % 256).astype(np.uint8)
    _, idx, dfl, wfl, nd, maxb = prep_flat(raw, 64, 1)
    print(f"-- A: u8 d64, nb {nd}, maxb {maxb}", flush=True)

    def full(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd, 8, maxb), wf.reshape(nd, 64), "delta", 1, False)

    set_prefix_chunk(256)
    ref = jax.jit(full)(dfl, wfl)
    ref.block_until_ready()
    for c in (128, 512):
        set_prefix_chunk(c)
        print(f"  exact c{c}: {_eq(ref, jax.jit(full)(dfl, wfl))}",
              flush=True)
    for rep in range(2):
        for c in (128, 256, 512):
            set_prefix_chunk(c)
            t = devloop_time(full, (dfl, wfl), 16)
            print(f"  u8 full prefix-chunk {c}: "
                  f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    raw16 = (np.cumsum(rng.integers(-6, 7, (nr // 2, 64)), axis=0)
             % 65536).astype(np.uint16)
    _, _, dfl16, wfl16, nd16, maxb16 = prep_flat(raw16, 64, 2)

    def full16(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd16, 8, maxb16), wf.reshape(nd16, 64),
            "delta", 2, False)

    for rep in range(2):
        for c in (256, 512):
            set_prefix_chunk(c)
            t = devloop_time(full16, (dfl16, wfl16), 16)
            print(f"  u16 full prefix-chunk {c}: "
                  f"{raw16.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    set_prefix_chunk(256)

    # ---------------- Part B: inherited-win re-measures ----------------
    # runs stream (1/3 rows in runs)
    seg = rng.integers(-6, 7, (nr, 64))
    m = (np.arange(nr) // 256 % 3 == 0)[:, None]
    rawr = (np.cumsum(np.where(m, 0, seg), axis=0) % 256).astype(np.uint8)
    s2 = encoder.compress(rawr.reshape(-1), 64, codec="delta")
    ng2, _, _ = read_metadata_rle(s2)
    idx2 = decoder.walk_headers(s2, ng2, 64, 1, lowdim=False)
    d2 = decoder.gather_payloads(s2, idx2, 64, 1, False)
    rows_pad2 = next_bucket(int(idx2.total_rows))
    nd2 = next_bucket(d2.shape[0])
    orp = np.full(nd2, rows_pad2 + 8, dtype=np.int64)
    orp[: d2.shape[0]] = idx2.out_rows
    dp2 = pad_rows(d2, nd2)
    wp2 = pad_rows(idx2.widths, nd2)
    rmb = dp2.shape[2]
    dj2 = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
    wj2 = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))
    oj2 = jnp.asarray(orp, jnp.int32)

    def kern_runs(d, w, o):
        return decoder._decode_pass.__wrapped__(
            d.reshape(nd2, 8, rmb), w.reshape(nd2, 64), o,
            "delta", 1, False, rows_pad2)

    for rep in range(2):
        t = devloop_time(kern_runs, (dj2, wj2, oj2), 16)
        print(f"  runs-stream kernel: {rawr.nbytes / t / 1e9:6.2f} GB/s",
              flush=True)

    # query compact sum on the headline stream
    from sprintz_tpu.query import pushdown

    run = pushdown._get_compact_run()
    gaps = jnp.zeros((nd,), jnp.int32)
    nblocks = jnp.int32(idx.widths.shape[0])
    op = pushdown.Operation.REDUCE_SUM.value

    def kern_q(d, w):
        return run(d.reshape(nd, 8, maxb), w.reshape(nd, 64),
                   gaps, jnp.int32(0), nblocks, 1, False, op)

    for rep in range(2):
        t = devloop_time(kern_q, (dfl, wfl), 16)
        print(f"  query-sum kernel: {raw.nbytes / t / 1e9:6.2f} GB/s",
              flush=True)

    # xff-par u8 (sidecar chunk-parallel, every=16)
    s3, sc = checkpoint.compress_with_sidecar(
        raw.reshape(-1), 64, codec="xff", every_groups=16)
    ng3, _, _ = read_metadata_rle(s3)
    idx3 = decoder.walk_headers(s3, ng3, 64, 1, lowdim=False)
    d3 = decoder.gather_payloads(s3, idx3, 64, 1, False)
    C = len(sc.byte_offsets)
    cob = (np.searchsorted(sc.byte_offsets, idx3.payload_offsets,
                           side="right") - 1)
    counts = np.bincount(cob, minlength=C)
    nb_pad = next_bucket(int(counts.max()))
    dense_c = np.zeros((C, nb_pad) + d3.shape[1:], np.uint8)
    widths_c = np.zeros((C, nb_pad, 64), np.int32)
    order = np.argsort(cob, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)])
    for c in range(C):
        segi = order[starts[c]: starts[c + 1]]
        dense_c[c, : len(segi)] = d3[segi]
        widths_c[c, : len(segi)] = idx3.widths[segi]
    states = np.zeros((C, 3, 64), np.int32)
    states[:, : sc.states.shape[1]] = sc.states
    lr = jnp.zeros((C, nb_pad), jnp.int32)
    xmb = dense_c.shape[3]

    def kern_x(d, w, s):
        return decoder._decode_pass_chunks.__wrapped__(
            d.reshape(C, nb_pad, 8, xmb), w.reshape(C, nb_pad, 64),
            lr, s, "xff", 1, False, nb_pad * 8, True)

    for rep in range(2):
        t = devloop_time(
            kern_x, (jnp.asarray(dense_c.reshape(-1)),
                     jnp.asarray(widths_c.reshape(-1)),
                     jnp.asarray(states)), 16)
        print(f"  xff-par/u8 kernel ({C} chunks): "
              f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    # 64 MiB tiled kernel leg (composed-row denominator)
    nr64 = 1 << 20
    raw64 = (np.cumsum(rng.integers(-6, 7, (nr64, 64)), axis=0)
             % 256).astype(np.uint8)
    _, _, dfl64, wfl64, nd64, mb64 = prep_flat(raw64, 64, 1)
    tile_nb = max(1, decoder.CHUNK_OUT_BYTES // (8 * 64))
    tiles = max(1, nd64 // tile_nb)
    if nd64 % tiles:
        tiles = 1
    nb_t = nd64 // tiles

    def kern64(d, w):
        dr = d.reshape(tiles, nb_t, 8, mb64)
        wr = w.reshape(tiles, nb_t, 64)
        state = jnp.zeros((3, 64), jnp.int32)
        outs = []
        for k in range(tiles):
            vals, state = \
                decoder._decode_pass_contiguous_chunk.__wrapped__(
                    dr[k], wr[k], state, "delta", 1, False)
            outs.append(vals)
        return jnp.concatenate(outs)

    for rep in range(2):
        t = devloop_time(kern64, (dfl64, wfl64), 4)
        print(f"  64MiB tiled x{tiles} kernel: "
              f"{raw64.nbytes / t / 1e9:6.2f} GB/s", flush=True)
    print("SESSION53 DONE", flush=True)


if __name__ == "__main__":
    main()
