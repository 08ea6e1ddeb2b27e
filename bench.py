"""Benchmark: Sprintz-TPU device kernel throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: steady-state device throughput of the full decode pass
(payload unpack + zigzag + delta prefix reconstruction) on uint8 64-dim
row-major data — the reference's headline is "multiple GB/s" single-thread
decode (communicate/results.tex:162); baseline taken as 3.0 GB/s.

Methodology: kernels are timed inside an on-device fori_loop whose inputs
are perturbed by the loop index, so iterations cannot be hoisted and
per-dispatch relay/host overhead (which dominates single calls in this
environment) is amortized away. Context numbers go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_DECODE_GBPS = 3.0


def devloop_time(kernel, args, iters, vary=0, chain=False,
                 min_seconds=0.25):
    """Per-iteration on-device time of ``kernel(*args)``.

    Methodology (two defenses, both required in this environment):

    - **Hoisting-proof**: the varied arg rides the fori_loop carry and is
      perturbed by the loop index, so XLA cannot hoist the kernel out of
      the loop.
    - **Relay-latency-proof (two-point slope)**: the axon relay adds a
      large FIXED latency per dispatch (measured ~60 ms — size-independent,
      it dwarfed 8-iteration loops and capped round-1 numbers near
      8 MiB / 60 ms). So the loop trip count is a *traced* argument: one
      compilation, timed at ``iters`` and ``3*iters``; the slope
      ``(t3 - t1) / (2*iters)`` cancels every fixed cost exactly.

    ``chain=True`` (kernel output same shape/dtype as ``args[vary]``)
    feeds the output back as the next iteration's input — zero-overhead
    and DCE-proof; otherwise the output is fully reduced into the carry
    (costs one extra read of the output, a small bias acknowledged here).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(n, *a):
        def body(i, st):
            arr, acc = st
            flat = arr.reshape(-1)
            arr = flat.at[0].set((i & 1).astype(arr.dtype)).reshape(arr.shape)
            aa = list(a)
            aa[vary] = arr
            out = kernel(*aa)
            leaf = jax.tree_util.tree_leaves(out)[0]
            if chain:
                return leaf.astype(arr.dtype), acc
            # full reduction: XLA cannot elide any part of the output
            return arr, acc + jnp.sum(leaf.astype(jnp.float32))

        arr, acc = jax.lax.fori_loop(
            0, n, body, (a[vary], jnp.float32(0)))
        # in chain mode acc is untouched; the final carried array must
        # feed the result or XLA dead-codes the entire loop
        return acc + jnp.sum(arr.astype(jnp.float32))

    # every dispatch gets unique inputs (a salted element of the varied
    # arg), so no relay/runtime layer can serve a repeat execution from
    # cache — observed symptom: the same kernel timing 4x apart across
    # runs, and identical second calls returning implausibly fast
    salt_counter = iter(range(1, 1 << 30))

    def salted_args():
        k = next(salt_counter)
        aa = list(args)
        leaf = aa[vary].reshape(-1)
        aa[vary] = leaf.at[min(1, leaf.size - 1)].set(
            jnp.asarray(k % 97, leaf.dtype)).reshape(aa[vary].shape)
        jax.block_until_ready(aa[vary])
        return aa

    def timed(n):
        aa = salted_args()
        r = loop(n, *aa)  # warm (compile on first call)
        r.block_until_ready()
        aa = salted_args()
        t0 = time.perf_counter()
        r = loop(n, *aa)
        r.block_until_ready()
        return time.perf_counter() - t0

    # adaptive trip count: relay latency varies run to run by ~tens of
    # ms, so the slope's signal (2n * per_iter) must dwarf that; grow n
    # until the measured delta is large enough. n is traced — no
    # recompile on growth.
    n = iters
    while True:
        t1, t3 = timed(n), timed(3 * n)
        delta = t3 - t1
        if delta >= min_seconds or n >= (1 << 16):
            break
        n = min(1 << 16, n * 4)
    # Outlier guard (BENCH_r03 incident: a single multi-second relay
    # stall inside ONE timed() at small n satisfies the >= min_seconds
    # exit and records a 100-700x-off number — too slow if the stall
    # hit t3, too fast if it hit t1). Stalls only ever ADD wall time,
    # so the MIN of each endpoint over independent samples is
    # stall-proof; re-sample until the slope of the mins is stable
    # (two consecutive estimates within 20%). A stall in EVERY t1
    # sample can still leave min(t3)-min(t1) <= 0 (session 39: the
    # 1e-9 clamp "stabilized" and printed 7.8e7 GB/s) — the adaptive
    # loop guaranteed a >= min_seconds slope at this n, so any stable
    # estimate far below that is degenerate: regrow n and resample,
    # falling back to the conservative whole-loop upper bound.
    for _ in range(3):
        t1s, t3s = [t1], [t3]
        est = min(t3s) - min(t1s)
        for _ in range(3):
            t1s.append(timed(n))
            t3s.append(timed(3 * n))
            new = min(t3s) - min(t1s)
            if new > 0 and abs(new - est) <= 0.2 * new:
                est = new
                break
            est = new
        if est >= 0.5 * min_seconds:
            return est / (2 * n)
        if n >= (1 << 16):
            break
        n = min(1 << 16, n * 4)
        t1, t3 = timed(n), timed(3 * n)
    # degenerate at the n cap: whole-loop time bounds per-iter cost
    # from above (includes the fixed relay term — conservative)
    return min(t3s) / (3 * n)


def _metric_name(label: str) -> str:
    """Normalize a bench metric label: parenthesized run parameters
    (chunk counts, cs, S) vary run to run and are not part of the
    metric's identity."""
    import re

    return re.sub(r"\s*\([^)]*\)", "", label).strip()


def parse_bench_metrics(text: str) -> dict:
    """Extract {metric: GB/s} pairs from a bench stderr line/tail."""
    import re

    out = {}
    for m in re.finditer(r"([^|{}\n]+?):\s*([0-9]+\.[0-9]+)\s*GB/s", text):
        out[_metric_name(m.group(1))] = float(m.group(2))
    return out


def envelope_check(current: dict) -> list:
    """Warn when any current metric lands >10% below its best prior
    BENCH_r*.json value (VERDICT r4 item 2: the devloop outlier guard
    catches order-of-magnitude stalls, not 13% drift). Returns the
    warning strings (also printed to stderr)."""
    import glob

    best: dict = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        for k, v in parse_bench_metrics(rec.get("tail", "")).items():
            # skip transfer/e2e rows: relay-dominated, not kernel drift
            if "e2e" in k or "transfer" in k:
                continue
            if v > best.get(k, (0.0, ""))[0]:
                best[k] = (v, os.path.basename(path))
    warnings = []
    for k, v in current.items():
        if "e2e" in k or "transfer" in k or k not in best:
            continue
        b, src = best[k]
        if v < 0.9 * b:
            w = (f"bench ENVELOPE: {k} = {v:.2f} GB/s is "
                 f"{100 * (1 - v / b):.0f}% below best prior "
                 f"{b:.2f} ({src})")
            warnings.append(w)
            print(w, file=sys.stderr)
    return warnings


def _claim_device_with_retry():
    """Return jax.devices()[0], re-execing to retry on relay UNAVAILABLE.

    The axon relay intermittently refuses claims (observed outages from
    minutes to hours); backend-init failure is cached per process, so a
    retry must be a fresh process. Bounded so the driver's timeout is
    respected: SPRINTZ_BENCH_RETRIES attempts (default 2), 120 s apart.
    """
    import jax

    try:
        return jax.devices()[0]
    except RuntimeError as e:
        if "UNAVAILABLE" not in str(e):
            raise
        done = int(os.environ.get("_SPRINTZ_BENCH_ATTEMPT", "0"))
        if done >= int(os.environ.get("SPRINTZ_BENCH_RETRIES", "2")):
            raise
        print(f"bench: device claim UNAVAILABLE (attempt {done + 1}); "
              "retrying in 120 s", file=sys.stderr)
        time.sleep(120)
        os.environ["_SPRINTZ_BENCH_ATTEMPT"] = str(done + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import jax
    import jax.numpy as jnp

    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.models.forecasters import fire_decode
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    dev = _claim_device_with_retry()
    print(f"bench device: {dev}", file=sys.stderr)

    # process-level warmup: the first program on this backend pays a
    # multi-second one-time cost even after its own compile
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)

    rng = np.random.default_rng(0)
    ndims = 64
    nrows = 1 << 17  # 128k rows x 64 dims = 8 MiB uint8
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0) % 256
           ).astype(np.uint8)
    flat = raw.reshape(-1)
    nbytes = flat.nbytes

    # byte-exact stream via the jax encoder (includes host plan/assembly).
    # e2e numbers are WARM (second call: compile excluded, device
    # transfer through the relay included — the relay moves MBs at
    # ~1 MB/s, an environment property; transfer is reported separately
    # below so the host+kernel pipeline cost is visible on its own).
    stream = encoder.compress(flat, ndims, codec="delta")  # warm/compile
    t0 = time.perf_counter()
    stream = encoder.compress(flat, ndims, codec="delta")
    t_enc_e2e = time.perf_counter() - t0
    ratio = nbytes / len(stream)

    out = decoder.decompress(stream, codec="delta", elem_sz=1)  # warm
    t0 = time.perf_counter()
    out = decoder.decompress(stream, codec="delta", elem_sz=1)
    t_dec_e2e = time.perf_counter() - t0
    assert np.array_equal(out, flat), "bench roundtrip failed"

    # transfer cost in isolation: one 8 MiB host->device->host round trip
    xfer = jnp.asarray(flat)
    jax.block_until_ready(xfer)
    t0 = time.perf_counter()
    xfer = jnp.asarray(np.bitwise_xor(flat, 1))
    jax.block_until_ready(xfer)
    np.asarray(xfer)
    t_xfer = time.perf_counter() - t0
    del xfer

    # headline: full decode pass steady state on device, using the same
    # dispatch production decompress() uses (contiguous fast path when
    # the stream has no runs, else width-signature grouping / general)
    ngroups, _, _ = read_metadata_rle(stream)
    idx = decoder.walk_headers(stream, ngroups, ndims, 1, lowdim=False)
    dense = decoder.gather_payloads(stream, idx, ndims, 1, False)
    rows_pad = next_bucket(idx.total_rows)
    if idx.total_rows == idx.widths.shape[0] * 8:
        nd_pad = next_bucket(dense.shape[0])
        dpad = pad_rows(dense, nd_pad)
        wpad = pad_rows(idx.widths, nd_pad)
        out_rows_j = jnp.zeros((1,), jnp.int32)  # unused
        if decoder._decode_flat_ok(False):
            # production layout (session 42): flat 1-D params, reshaped
            # inside jit — no padded minor-dim parameter at rest
            dense_j = jnp.asarray(np.ascontiguousarray(dpad).reshape(-1))
            widths_j = jnp.asarray(np.ascontiguousarray(wpad).reshape(-1))
            maxb_h, nd_h = dpad.shape[2], wpad.shape[1]

            def decode_kernel(d, w, o):
                return decoder._decode_pass_contiguous.__wrapped__(
                    d.reshape(nd_pad, 8, maxb_h), w.reshape(nd_pad, nd_h),
                    "delta", 1, False)
        else:
            dense_j = jnp.asarray(dpad)
            widths_j = jnp.asarray(wpad)

            def decode_kernel(d, w, o):
                return decoder._decode_pass_contiguous.__wrapped__(
                    d, w, "delta", 1, False)
    elif (grouping := decoder.group_by_signature(idx)) is not None:
        uniq_pad, perm = grouping
        u_pad, c_pad = perm.shape
        dense_g = np.zeros((u_pad, c_pad) + dense.shape[1:], dense.dtype)
        org = np.full((u_pad, c_pad), rows_pad + 8, dtype=np.int64)
        valid = perm >= 0
        dense_g[valid] = dense[perm[valid]]
        org[valid] = idx.out_rows[perm[valid]]
        dense_j = jnp.asarray(dense_g)
        widths_j = jnp.asarray(uniq_pad)
        out_rows_j = jnp.asarray(org, jnp.int32)

        def decode_kernel(d, w, o):
            return decoder._decode_pass_grouped.__wrapped__(
                d, w, o, "delta", 1, False, rows_pad)
    else:
        nd_pad = next_bucket(dense.shape[0])
        out_rows = np.full(nd_pad, rows_pad + 8, dtype=np.int64)
        out_rows[: dense.shape[0]] = idx.out_rows
        dense_j = jnp.asarray(pad_rows(dense, nd_pad))
        widths_j = jnp.asarray(pad_rows(idx.widths, nd_pad))
        out_rows_j = jnp.asarray(out_rows, jnp.int32)

        def decode_kernel(d, w, o):
            return decoder._decode_pass.__wrapped__(
                d, w, o, "delta", 1, False, rows_pad)

    # one salted adaptive-slope measurement (bench.py docstring); kept to
    # a single run so the driver's timeout holds through slow relay
    # compiles
    t_kernel = devloop_time(
        decode_kernel, (dense_j, widths_j, out_rows_j), 32)
    gbps = nbytes / t_kernel / 1e9

    # context numbers for other configurations (u16 delta, xff), each
    # guarded by a wall-clock budget so slow relay compiles cannot push
    # the driver past its timeout
    t_start = time.perf_counter()
    extra_notes = []

    def extra_config(codec2, elem_sz2, budget_s):
        if time.perf_counter() - t_start > budget_s:
            return
        dt2 = np.uint8 if elem_sz2 == 1 else np.uint16
        hi2 = 1 << (8 * elem_sz2)
        nrows2 = nrows // elem_sz2
        raw2 = (np.cumsum(rng.integers(-6, 7, (nrows2, ndims)), axis=0)
                % hi2).astype(dt2)
        s2 = encoder.compress(raw2.reshape(-1), ndims, codec=codec2)
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, ndims, elem_sz2, lowdim=False)
        d2 = decoder.gather_payloads(s2, idx2, ndims, elem_sz2, False)
        if idx2.total_rows != idx2.widths.shape[0] * 8:
            return  # non-contiguous: skip (covered by headline dispatch)
        nd2 = next_bucket(d2.shape[0])
        dp2 = pad_rows(d2, nd2)
        wp2 = pad_rows(idx2.widths, nd2)
        if decoder._decode_flat_ok(False):
            dj = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
            wj = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))
            mb2, ndm2 = dp2.shape[2], wp2.shape[1]

            def kern(d, w):
                return decoder._decode_pass_contiguous.__wrapped__(
                    d.reshape(nd2, 8, mb2), w.reshape(nd2, ndm2),
                    codec2, elem_sz2, False)
        else:
            dj = jnp.asarray(dp2)
            wj = jnp.asarray(wp2)

            def kern(d, w):
                return decoder._decode_pass_contiguous.__wrapped__(
                    d, w, codec2, elem_sz2, False)

        t2 = devloop_time(kern, (dj, wj), 32)
        extra_notes.append(
            f"{codec2}/u{8 * elem_sz2} kernel: "
            f"{raw2.nbytes / t2 / 1e9:.2f} GB/s")

    def extra_xff_parallel(budget_s):
        """Sidecar chunk-parallel FIRE decode (checkpoint.py): the serial
        scan shortens from nb to nb/C blocks with C chunks in lanes."""
        if time.perf_counter() - t_start > budget_s:
            return
        from sprintz_tpu import checkpoint

        raw2 = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0)
                % 256).astype(np.uint8)
        s2, sc = checkpoint.compress_with_sidecar(
            raw2.reshape(-1), ndims, codec="xff", every_groups=16)
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, ndims, 1, lowdim=False)
        d2 = decoder.gather_payloads(s2, idx2, ndims, 1, False)
        ndata2 = idx2.widths.shape[0]
        if idx2.total_rows != ndata2 * 8:
            return
        C = len(sc.byte_offsets)
        cob = (np.searchsorted(sc.byte_offsets, idx2.payload_offsets,
                               side="right") - 1)
        counts = np.bincount(cob, minlength=C)
        nb_pad = next_bucket(int(counts.max()))
        dense_c = np.zeros((C, nb_pad) + d2.shape[1:], np.uint8)
        widths_c = np.zeros((C, nb_pad, ndims), np.int32)
        order = np.argsort(cob, kind="stable")
        starts = np.concatenate([[0], np.cumsum(counts)])
        for c in range(C):
            seg = order[starts[c]: starts[c + 1]]
            dense_c[c, : len(seg)] = d2[seg]
            widths_c[c, : len(seg)] = idx2.widths[seg]
        states = np.zeros((C, 3, ndims), np.int32)
        states[:, : sc.states.shape[1]] = sc.states
        lr = jnp.zeros((C, nb_pad), jnp.int32)
        xmb = dense_c.shape[3]

        def kern(d, w, s):
            return decoder._decode_pass_chunks.__wrapped__(
                d.reshape(C, nb_pad, 8, xmb),
                w.reshape(C, nb_pad, ndims), lr, s,
                "xff", 1, False, nb_pad * 8, True)

        t2 = devloop_time(
            kern, (jnp.asarray(dense_c.reshape(-1)),
                   jnp.asarray(widths_c.reshape(-1)),
                   jnp.asarray(states)), 32)
        extra_notes.append(
            f"xff-par/u8 kernel ({C} chunks): "
            f"{raw2.nbytes / t2 / 1e9:.2f} GB/s")

    def extra_encode_kernel(budget_s):
        """Device encode pass (forecast + widths + MXU pack) — the
        kernel-side counterpart of the reference's >200 MB/s compression
        bar (communicate/results.tex:168); host plan/assembly are
        measured separately (tools/profile_encode.py). Rows ride as the
        NARROW u8 param production compress() passes (the pass widens
        on device) — the int32 param this row used through round 5 was
        4x the HBM and is not the production layout (the same
        measurement bug session 45b fixed for the xff-batch row)."""
        if time.perf_counter() - t_start > budget_s:
            return
        rows_j = jnp.asarray(raw)

        def kern(r):
            return encoder._encode_pass.__wrapped__(r, "delta", 1, False)

        t2 = devloop_time(kern, (rows_j,), 32)
        extra_notes.append(f"encode kernel: {nbytes / t2 / 1e9:.2f} GB/s")

    def extra_lowdim(budget_s):
        """Lowdim (column-major) decode kernel, delta/u8 d4 — the layout
        the reference dispatches for ndims <= 4 (sprintz.cpp:61-74)."""
        if time.perf_counter() - t_start > budget_s:
            return
        nr = 1 << 20
        raw2 = (np.cumsum(rng.integers(-6, 7, (nr, 4)), axis=0)
                % 256).astype(np.uint8)
        s2 = encoder.compress(raw2.reshape(-1), 4, codec="delta")
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, 4, 1, lowdim=True)
        d2 = decoder.gather_payloads(s2, idx2, 4, 1, True)
        if idx2.total_rows != idx2.widths.shape[0] * 8:
            return
        nd2 = next_bucket(d2.shape[0])
        dp2 = pad_rows(d2, nd2)
        wp2 = pad_rows(idx2.widths, nd2)
        ld1, ld2 = dp2.shape[1], dp2.shape[2]
        dj = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
        wj = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))

        def kern(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d.reshape(nd2, ld1, ld2), w.reshape(nd2, 4),
                "delta", 1, True)

        t2 = devloop_time(kern, (dj, wj), 32)
        extra_notes.append(
            f"delta/u8 lowdim d4 kernel: {raw2.nbytes / t2 / 1e9:.2f} GB/s")
        # flat-param lowdim encode (sessions 40/41: the (N, D) param
        # layout was the encode floor; d4 dmajor 1.68 -> flat 2.37)
        fj = jnp.asarray(pad_rows(
            raw2, (next_bucket(nr // 8) * 8)).reshape(-1))

        def kern_e(f):
            return encoder._encode_pass.__wrapped__(
                f, "delta", 1, True, flat_ndims=4)

        t3 = devloop_time(kern_e, (fj,), 16)
        extra_notes.append(
            f"delta/u8 lowdim d4 encode (flat): "
            f"{raw2.nbytes / t3 / 1e9:.2f} GB/s")

    def extra_runs(budget_s):
        """RLE-heavy stream decode (1/3 rows in runs): exercises the
        block-gather timeline (10.5 GB/s on device, session 15 — 2x
        over the row scatter it replaced)."""
        if time.perf_counter() - t_start > budget_s:
            return
        seg = rng.integers(-6, 7, (nrows, ndims))
        m = (np.arange(nrows) // 256 % 3 == 0)[:, None]
        raw2 = (np.cumsum(np.where(m, 0, seg), axis=0) % 256
                ).astype(np.uint8)
        s2 = encoder.compress(raw2.reshape(-1), ndims, codec="delta")
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, ndims, 1, lowdim=False)
        d2 = decoder.gather_payloads(s2, idx2, ndims, 1, False)
        rows_pad2 = next_bucket(int(idx2.total_rows))
        nd2 = next_bucket(d2.shape[0])
        orp = np.full(nd2, rows_pad2 + 8, dtype=np.int64)
        orp[: d2.shape[0]] = idx2.out_rows
        dp2 = pad_rows(d2, nd2)
        wp2 = pad_rows(idx2.widths, nd2)
        rmb = dp2.shape[2]
        dj = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
        wj = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))
        oj = jnp.asarray(orp, jnp.int32)

        def kern(d, w, o):
            return decoder._decode_pass.__wrapped__(
                d.reshape(nd2, 8, rmb), w.reshape(nd2, ndims), o,
                "delta", 1, False, rows_pad2)

        t2 = devloop_time(kern, (dj, wj, oj), 32)
        extra_notes.append(
            f"delta/u8 runs-stream kernel: {raw2.nbytes / t2 / 1e9:.2f} GB/s")

    def extra_huffman(budget_s):
        """Chunk-parallel device Huffman decode + encode kernels (the
        paper's +Huf stage, communicate/method.tex:300-303). Throughput
        in SYMBOL bytes (the coder's uncompressed side). Chunk size is
        the decode-speed knob (refill traffic scales with it)."""
        if time.perf_counter() - t_start > budget_s:
            return
        from sprintz_tpu.entropy import huffman as hf
        from sprintz_tpu.utils.shapes import next_bucket as nb_

        cs = int(os.environ.get("SPRINTZ_BENCH_HUFF_CHUNK", "128"))
        payload = np.frombuffer(stream, np.uint8)
        comp = hf.huff_compress(payload, chunk_symbols=cs,
                                allow_stored=False)
        words, tables, _, nchunks, nsym = hf.device_decode_prep(comp)
        tj = [jnp.asarray(x) for x in tables]
        wj = jnp.asarray(words)

        from sprintz_tpu.entropy import pallas_huffman as ph

        if (ph.decode_pallas_available(words.shape[1], cs)
                and hf._pallas_on_accelerator()):
            # production TPU path: VMEM-resident Pallas kernel + the XLA
            # bitslice permutation tail (sessions 26/29)
            fuse = ph.FUSE_PERM

            def kern(w, a, b, p):
                packed = ph.decode_device_pallas(
                    w, a, b, cs, perm_b=p if fuse else None)
                pt = packed.T
                idx = jnp.stack([pt & 255, (pt >> 8) & 255], -1).reshape(
                    pt.shape[0], 2 * ((cs + 1) // 2))[:, :cs]
                if fuse:
                    return idx.astype(jnp.uint8)
                return hf._byte_lookup(idx, p).astype(jnp.uint8)

            label = "pallas-fused" if fuse else "pallas"
        else:
            dec = hf.get_decode_device()

            def kern(w, a, b, p):
                return dec(w, a, b, p, cs)

            label = "xla"

        t2 = devloop_time(kern, (wj, tj[0], tj[1], tj[2]), 8)
        extra_notes.append(
            f"huff-dec kernel ({label}, cs={cs}): {nsym / t2 / 1e9:.2f} GB/s")
        # encode: device lookup + append-scan pass (host assembly apart,
        # mirroring the sprintz encode-kernel metric above)
        t = hf.build_table(payload)
        nch = max(1, -(-nsym // cs))
        syms = np.full((nb_(nch, 8), cs), 256, np.uint16)
        syms.reshape(-1)[:nsym] = payload
        enc = hf.get_encode_device()
        t3 = devloop_time(
            enc, (jnp.asarray(syms),
                  jnp.asarray(hf.encode_lut_packed(t))), 8)
        extra_notes.append(
            f"huff-enc kernel (cs={cs}): {nsym / t3 / 1e9:.2f} GB/s")

    def extra_ndims_dip(budget_s):
        """The d8 u8 cell — the reference's documented worst zone just
        past the lowdim boundary (communicate/results.tex:156-162) and
        the wordsel auto route's maxb-8 case. Full D curve: STATUS
        session 45."""
        if time.perf_counter() - t_start > budget_s:
            return
        D = 8
        nr = 1 << 20
        raw2 = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
                % 256).astype(np.uint8)
        s2 = encoder.compress(raw2.reshape(-1), D, codec="delta")
        ng2, _, _ = read_metadata_rle(s2)
        idx2 = decoder.walk_headers(s2, ng2, D, 1, lowdim=False)
        d2 = decoder.gather_payloads(s2, idx2, D, 1, False)
        if idx2.total_rows != idx2.widths.shape[0] * 8:
            return
        nd2 = next_bucket(d2.shape[0])
        dp2 = pad_rows(d2, nd2)
        wp2 = pad_rows(idx2.widths, nd2)
        mb2 = dp2.shape[2]
        dj = jnp.asarray(np.ascontiguousarray(dp2).reshape(-1))
        wj = jnp.asarray(np.ascontiguousarray(wp2).reshape(-1))

        def kern(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d.reshape(nd2, 8, mb2), w.reshape(nd2, D),
                "delta", 1, False)

        t2 = devloop_time(kern, (dj, wj), 16)
        extra_notes.append(
            f"delta/u8 d8 kernel: {raw2.nbytes / t2 / 1e9:.2f} GB/s")

    def extra_query(budget_s):
        """Fused query pushdown (REDUCE_SUM, materialize=False) on the
        headline stream: decode + reduce in one program with no output
        write — the reference's query engine exists purely for this
        speedup (query.hpp:22-29). Contiguous stream -> compact pass."""
        if time.perf_counter() - t_start > budget_s:
            return
        from sprintz_tpu.query import pushdown

        dq = dense  # headline stream payloads (contiguous)
        ndq = next_bucket(dq.shape[0])
        run = pushdown._get_compact_run()
        dpq = pad_rows(dq, ndq)
        wpq = pad_rows(idx.widths, ndq)
        qmb = dpq.shape[2]
        djq = jnp.asarray(np.ascontiguousarray(dpq).reshape(-1))
        wjq = jnp.asarray(np.ascontiguousarray(wpq).reshape(-1))
        gaps = jnp.zeros((ndq,), jnp.int32)
        tg = jnp.int32(0)
        nblocks = jnp.int32(dq.shape[0])
        op = pushdown.Operation.REDUCE_SUM.value

        def kern(d, w):
            return run(d.reshape(ndq, 8, qmb), w.reshape(ndq, ndims),
                       gaps, tg, nblocks, 1, False, op)

        t2 = devloop_time(kern, (djq, wjq), 32)
        extra_notes.append(
            f"query-sum kernel: {nbytes / t2 / 1e9:.2f} GB/s")

    def extra_composed(budget_s):
        """Composed single-chip decode rate net of relay transfer
        (VERDICT r4 item 5): the production host pipeline (fused
        overlapped walk+gather + flat param prep, measured on this
        host) SUMMED with the device kernel's steady-state per-pass
        time at the same 64 MiB shape. The relay transfer is excluded
        (reported separately above) — it is an environment property,
        not a framework one; a direct-attached TPU pays PCIe instead."""
        if time.perf_counter() - t_start > budget_s:
            return
        nrows64 = 1 << 20  # 64 MiB u8 d64
        raw64 = (np.cumsum(rng.integers(-6, 7, (nrows64, ndims)), axis=0)
                 % 256).astype(np.uint8)
        s64 = encoder.compress(raw64.reshape(-1), ndims, codec="delta")
        ng64, _, _ = read_metadata_rle(s64)
        n64 = raw64.nbytes
        t_host = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            idx64, dense64 = decoder.index_and_gather(
                s64, ng64, ndims, 1, False, pad_dense=True)
            nd64 = next_bucket(idx64.widths.shape[0])
            dp64 = pad_rows(dense64, nd64)  # no-op: gather pre-padded
            wp64 = pad_rows(idx64.widths, nd64)
            dfl = np.ascontiguousarray(dp64).reshape(-1)
            wfl = np.ascontiguousarray(wp64).reshape(-1)
            t_host = min(t_host, time.perf_counter() - t0)
        mb64 = dp64.shape[2]
        dj64 = jnp.asarray(dfl)
        wj64 = jnp.asarray(wfl)
        # production tiling (CHUNK_OUT_BYTES): state-carried 8 MiB tiles
        # measured 17.9 GB/s on this stream vs 10.8 as one 64 MiB pass
        # (session 47 knee)
        tile_nb = max(1, decoder.CHUNK_OUT_BYTES // (8 * ndims))
        tiles = max(1, nd64 // tile_nb)
        if nd64 % tiles:
            tiles = 1  # uneven split: time the single pass
        nb_t = nd64 // tiles

        def kern(d, w):
            dr = d.reshape(tiles, nb_t, 8, mb64)
            wr = w.reshape(tiles, nb_t, ndims)
            state = jnp.zeros((3, ndims), jnp.int32)
            outs = []
            for k in range(tiles):
                vals, state = \
                    decoder._decode_pass_contiguous_chunk.__wrapped__(
                        dr[k], wr[k], state, "delta", 1, False)
                outs.append(vals)
            return jnp.concatenate(outs)

        t_kern = devloop_time(kern, (dj64, wj64), 8)
        composed = n64 / (t_host + t_kern) / 1e9
        extra_notes.append(
            f"decode e2e 64MiB (host+kernel, net of transfer): "
            f"{composed:.2f} GB/s "
            f"(host {n64 / t_host / 1e9:.2f} + kernel "
            f"{n64 / t_kern / 1e9:.2f})")
        # u16 cell — the reference's fastest family (results.tex:168)
        if time.perf_counter() - t_start > budget_s + 120:
            return
        raw16 = (np.cumsum(rng.integers(-6, 7, (nrows64 // 2, ndims)),
                           axis=0) % 65536).astype(np.uint16)
        s16 = encoder.compress(raw16.reshape(-1), ndims, codec="delta")
        ng16, _, _ = read_metadata_rle(s16)
        n16 = raw16.nbytes
        th16 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            idx16, d16 = decoder.index_and_gather(s16, ng16, ndims, 2,
                                                  False, pad_dense=True)
            ndp16 = next_bucket(idx16.widths.shape[0])
            dfl16 = np.ascontiguousarray(pad_rows(d16, ndp16)).reshape(-1)
            wfl16 = np.ascontiguousarray(
                pad_rows(idx16.widths, ndp16)).reshape(-1)
            th16 = min(th16, time.perf_counter() - t0)
        mb16 = d16.shape[2]
        tnb16 = max(1, decoder.CHUNK_OUT_BYTES // (8 * ndims * 2))
        tiles16 = max(1, ndp16 // tnb16)
        if ndp16 % tiles16:
            tiles16 = 1
        nbt16 = ndp16 // tiles16

        def kern16(d, w):
            dr = d.reshape(tiles16, nbt16, 8, mb16)
            wr = w.reshape(tiles16, nbt16, ndims)
            state = jnp.zeros((3, ndims), jnp.int32)
            outs = []
            for k in range(tiles16):
                vals, state = \
                    decoder._decode_pass_contiguous_chunk.__wrapped__(
                        dr[k], wr[k], state, "delta", 2, False)
                outs.append(vals)
            return jnp.concatenate(outs)

        tk16 = devloop_time(
            kern16, (jnp.asarray(dfl16), jnp.asarray(wfl16)), 8)
        extra_notes.append(
            f"decode e2e 64MiB u16 (host+kernel, net of transfer): "
            f"{n16 / (th16 + tk16) / 1e9:.2f} GB/s "
            f"(host {n16 / th16 / 1e9:.2f} + kernel "
            f"{n16 / tk16 / 1e9:.2f})")

    def extra_xff_batch(budget_s):
        """Batched multi-stream FIRE encode — the compress_batch
        operating point (VERDICT r3 item 10): S streams ride the vmap
        batch so the serial FIRE scan runs S*D lanes wide, the axis the
        framework's throughput design claims (SURVEY §5). Reference row:
        FIRE encode transform 5 GB/s single-thread AVX2
        (communicate/results.tex:186-193)."""
        if time.perf_counter() - t_start > budget_s:
            return
        # 512 streams x 16 KiB = 8 MiB aggregate: short per-stream scans
        # (32 steps) at 32k lanes — session-38 S sweep: S=64 4.6,
        # S=128 15.6, S=512 27.0 GB/s (the scan length dominates)
        S, nr = 512, 256
        raws = (np.cumsum(rng.integers(-6, 7, (S, nr, ndims)), axis=1)
                % 256).astype(np.uint8)
        # narrow u8 param + on-device widen — what production
        # compress/compress_batch pass (session 45b: the int32 param
        # was 4x the HBM and the round-4 S=64 weakness)
        rows_j = jnp.asarray(raws)
        batched = jax.vmap(
            lambda r: encoder._encode_pass.__wrapped__(
                r.astype(jnp.int32), "xff", 1, False))
        t2 = devloop_time(batched, (rows_j,), 8)
        extra_notes.append(
            f"xff-batch encode kernel (S={S}): "
            f"{raws.nbytes / t2 / 1e9:.2f} GB/s")

    if os.environ.get("SPRINTZ_BENCH_EXTRAS", "1") != "0":
        extra_config("delta", 2, budget_s=300)
        extra_config("xff", 1, budget_s=420)
        extra_xff_parallel(budget_s=540)
        extra_encode_kernel(budget_s=660)
        extra_lowdim(budget_s=780)
        extra_runs(budget_s=900)
        extra_huffman(budget_s=1020)
        extra_ndims_dip(budget_s=1100)
        extra_query(budget_s=1200)
        extra_composed(budget_s=1320)
        extra_xff_batch(budget_s=1500)
    fire_note = "".join(n + " | " for n in extra_notes)
    if os.environ.get("SPRINTZ_BENCH_FIRE"):
        # context: FIRE decode throughput when streams batch in lanes
        errs = jnp.asarray(rng.integers(0, 16, (4096 * 8, 512)), jnp.int32)
        t_fire = devloop_time(lambda e: fire_decode(e, 8), (errs,), 4)
        fire_note += f"fire kernel (512 lanes): {errs.size / t_fire / 1e9:.3f} GB/s | "

    print(
        f"encode e2e (warm): {nbytes / t_enc_e2e / 1e9:.3f} GB/s | "
        f"decode e2e (warm): {nbytes / t_dec_e2e / 1e9:.3f} GB/s | "
        f"transfer rt (8 MiB): {nbytes / t_xfer / 1e9:.3f} GB/s | "
        f"decode kernel: {gbps:.3f} GB/s | "
        f"{fire_note}"
        f"ratio: {ratio:.3f}x",
        file=sys.stderr,
    )

    current = parse_bench_metrics(
        f"decode kernel: {gbps:.3f} GB/s | {fire_note}")
    envelope_check(current)

    print(json.dumps({
        "metric": "decode_kernel_throughput_u8_delta_d64",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / BASELINE_DECODE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
