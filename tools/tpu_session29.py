"""TPU session 29: +Huf device decode END-TO-END devloop (VERDICT r3 item 1).

Session 26 timed the Pallas decode kernel alone (11.6-13.9 GB/s; packed
canonical indices) and the XLA scan (3.3 GB/s at cs=32); the host-timed
e2e was relay-distorted. This session devloop-times the FULL device
decode — Pallas kernel + transpose + bitslice permutation tail — as one
jitted function, picking the production default chunk size, and also
times the XLA tail alone to locate any gap.

Run:  timeout 4800 python -u tools/tpu_session29.py
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
    from sprintz_tpu.entropy.huffman import _bitslice_lookup

    rng = np.random.default_rng(7)
    D = 64
    nrows = 1 << (10 if SMOKE else 17)  # 8 MiB u8 d64
    iters = 2 if SMOKE else 16

    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    stream = encoder.compress(raw.reshape(-1), D, codec="delta")
    payload = np.frombuffer(stream, np.uint8)
    nsym = payload.size
    print(f"sprintz stream: {nsym / 2**20:.2f} MiB", flush=True)

    cs_list = [8] if SMOKE else [32, 64, 128]
    for cs in cs_list:
        comp = hf.huff_compress(payload, chunk_symbols=cs)
        words, tables, cs2, nchunks, n = hf.device_decode_prep(comp)
        if not ph.decode_pallas_available(words.shape[1], cs2):
            print(f"cs={cs}: not pallas-tileable, skip", flush=True)
            continue
        wj = jnp.asarray(words)
        lim, adj, perm_tt = (jnp.asarray(x) for x in tables)
        steps = (cs + 1) // 2

        def full(w, a, b, p, cs=cs):
            packed = ph.decode_device_pallas(w, a, b, cs, interpret=SMOKE)
            pt = packed.T  # (C, steps)
            idx = jnp.stack([pt & 255, (pt >> 8) & 255], -1).reshape(
                pt.shape[0], 2 * ((cs + 1) // 2))[:, :cs]
            return _bitslice_lookup(idx, p, 8).astype(jnp.uint8)

        # guarded single run + exactness first (faulting kernels wedge)
        out = np.asarray(jax.jit(full)(wj, lim, adj, perm_tt))
        ok = np.array_equal(out[:nchunks].reshape(-1)[:n], payload)
        print(f"cs={cs}: guarded run exact={ok}", flush=True)
        if not ok:
            continue
        t = devloop_time(full, (wj, lim, adj, perm_tt), iters)
        print(f"huff-dec pallas+tail cs={cs:4d}: {nsym / t / 1e9:6.2f} GB/s "
              f"(+Huf ratio {nsym / len(comp):.3f})", flush=True)

        # tail alone (transpose + bitslice perm) to locate the gap
        packed_j = jax.jit(
            lambda w, a, b, cs=cs: ph.decode_device_pallas(
                w, a, b, cs, interpret=SMOKE))(wj, lim, adj)

        def tail(pk, p, cs=cs):
            pt = pk.T
            idx = jnp.stack([pt & 255, (pt >> 8) & 255], -1).reshape(
                pt.shape[0], 2 * ((cs + 1) // 2))[:, :cs]
            return _bitslice_lookup(idx, p, 8).astype(jnp.uint8)

        t2 = devloop_time(tail, (packed_j, perm_tt), iters)
        print(f"huff-dec tail-only  cs={cs:4d}: {nsym / t2 / 1e9:6.2f} GB/s",
              flush=True)

    print("SESSION29 DONE", flush=True)


if __name__ == "__main__":
    main()
