"""TPU session 26: reworked device Huffman kernels (VERDICT r3 items 1, 8).

Session 24 measured the first-cut kernels at 0.34 GB/s decode (lane-pad
bloat) and byte-identical=False encode (bf16 downcast in the MXU dot).
This session measures the rework: lane-major words + bit-sliced
truth-table lookups (XLA scan), and the VMEM-resident Pallas decode.

Pallas discipline (CLAUDE.md): compile-only checks for every variant
FIRST; then ONE guarded runtime exactness test; timing only after that
comes back exact. Abort the pallas leg on any anomaly.

Run:  timeout 4800 python -u tools/tpu_session26.py
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
    from sprintz_tpu import encoder
    from sprintz_tpu.entropy import huffman as hf
    from sprintz_tpu.entropy import pallas_huffman as ph
    from sprintz_tpu.utils.shapes import next_bucket

    rng = np.random.default_rng(3)
    D = 64
    nrows = 1 << (10 if SMOKE else 17)  # 8 MiB u8 d64
    iters = 2 if SMOKE else 16

    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    stream = encoder.compress(raw.reshape(-1), D, codec="delta")
    payload = np.frombuffer(stream, np.uint8)
    nsym = payload.size
    print(f"sprintz stream: {nsym / 2**20:.2f} MiB", flush=True)

    # smoke uses cs=8: the unrolled Pallas kernel at cs>=32 blows up
    # XLA:CPU's LLVM (multi-minute compile; TPU is fine — CLAUDE.md)
    cs_list = [8] if SMOKE else [32, 64, 128, 256]
    preps = {}
    for cs in cs_list:
        comp = hf.huff_compress(payload, chunk_symbols=cs)
        words, tables, _, nchunks, n = hf.device_decode_prep(comp)
        preps[cs] = (comp, jnp.asarray(words),
                     [jnp.asarray(x) for x in tables], nchunks, n)

    # ---------------- 1. XLA scan decode (reworked): run + time
    dec = hf.get_decode_device()
    for cs in cs_list:
        comp, wj, tj, nchunks, n = preps[cs]
        out = np.asarray(dec(wj, *tj, cs))
        ok = np.array_equal(out[:nchunks].reshape(-1)[:n], payload)
        t = devloop_time(lambda w, a, b, c: dec(w, a, b, c, cs),
                         (wj, tj[0], tj[1], tj[2]), iters)
        print(f"huff-dec xla cs={cs:4d} C={wj.shape[1]:6d} W={wj.shape[0]:4d}"
              f": {nsym / t / 1e9:6.2f} GB/s exact={ok} "
              f"(+Huf ratio {nsym / len(comp):.3f})", flush=True)

    # ---------------- 2. XLA encode (exactness was the session-24 bug)
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
        print(f"huff-enc xla cs={cs:4d}: {nsym / tt / 1e9:6.2f} GB/s "
              f"byte-identical={ok}", flush=True)

    # ---------------- 3. Pallas decode: compile-only ALL variants first
    pall = [cs for cs in cs_list
            if ph.decode_pallas_available(preps[cs][1].shape[1], cs)]
    compiled = {}
    for cs in pall:
        _, wj, tj, nchunks, n = preps[cs]
        try:
            f = jax.jit(lambda w, a, b, cs=cs: ph.decode_device_pallas(
                w, a, b, cs, interpret=SMOKE))
            f.lower(wj, tj[0], tj[1]).compile()  # compile-only check
            compiled[cs] = f  # devloop_time retraces: keep the jit fn
            print(f"pallas cs={cs}: compiled ok", flush=True)
        except Exception as e:  # compile failures are safe; report + skip
            print(f"pallas cs={cs}: COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    # guarded runtime: smallest variant first, exactness before timing
    for cs in sorted(compiled):
        comp, wj, tj, nchunks, n = preps[cs]
        print(f"pallas cs={cs}: guarded first run...", flush=True)
        packed = np.asarray(compiled[cs](wj, tj[0], tj[1]))
        # reuse the host tail for exactness (perm via numpy)
        out = ph.decode_jax_pallas(np.asarray(wj),
                                   [np.asarray(x) for x in tj], cs,
                                   nchunks, n, interpret=SMOKE)
        ok = np.array_equal(out, payload)
        print(f"pallas cs={cs}: runtime ok, exact={ok}", flush=True)
        if not ok:
            print("pallas: NOT exact — skipping timing for this cs",
                  flush=True)
            continue
        t = devloop_time(compiled[cs], (wj, tj[0], tj[1]), iters)
        print(f"huff-dec pallas-kernel cs={cs:4d}: {nsym / t / 1e9:6.2f} "
              f"GB/s (packed indices only)", flush=True)
        # end-to-end incl. the XLA bitslice tail
        t1 = time.time()
        for _ in range(3):
            out = ph.decode_jax_pallas(np.asarray(wj),
                                       [np.asarray(x) for x in tj], cs,
                                       nchunks, n, interpret=SMOKE)
        te = (time.time() - t1) / 3
        print(f"huff-dec pallas e2e   cs={cs:4d}: {nsym / te / 1e9:6.2f} "
              f"GB/s (host-timed, relay-distorted)", flush=True)

    print("SESSION26 DONE", flush=True)


if __name__ == "__main__":
    main()
