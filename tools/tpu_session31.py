"""TPU session 31: runs-stream timeline A/B — gather vs dgather.

VERDICT r3 item 6 wants the runs-stream decode gap closed (10.5 GB/s vs
18.1 contiguous). "dgather" places the PACKED u8 payload on the timeline
before unpacking (1/8 the gathered bytes of the block-gather-of-i32-errs
variant, and the unpack writes the timeline directly); the cost is a
bigger unpack weight tensor (timeline blocks instead of data blocks).
Interleaved A/B/A/B x2 per config so drift cannot masquerade as a
difference (session-23 methodology).

Run:  timeout 5400 python -u tools/tpu_session31.py
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
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(8)
    D = 64
    iters = 2 if SMOKE else 16

    configs = ([(1, 3)] if SMOKE
               else [(1, 3), (1, 2), (2, 3)])  # (elem_sz, run 1-in-k)
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
        frac = 1 / k

        results = {"gather": [], "dgather": []}
        prev = decoder.RUNS_TIMELINE
        try:
            for rep in range(2):
                for mode in ("gather", "dgather"):
                    decoder.RUNS_TIMELINE = mode

                    def kern(d, w, o):
                        return decoder._decode_pass.__wrapped__(
                            d, w, o, "delta", esz, False, rows_pad)

                    if rep == 0:
                        out = np.asarray(kern(dj, wj, oj))[: idx.total_rows]
                        ok = np.array_equal(
                            out.reshape(-1),
                            raw.reshape(-1)[: out.size])
                        if not ok:
                            print(f"u{8*esz} runs1/{k} {mode}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (dj, wj, oj), iters)
                    results[mode].append(raw.nbytes / t / 1e9)
        finally:
            decoder.RUNS_TIMELINE = prev
        for mode, rs in results.items():
            print(f"u{8*esz} runs {frac:.2f} {mode:>8}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)

    print("SESSION31 DONE", flush=True)


if __name__ == "__main__":
    main()
