"""TPU session 50: verify scan-4 huff-enc and the xff chunk fix.

Run:  timeout 3600 python -u tools/tpu_session50.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.entropy import huffman as hf
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(50)
    raw = (np.cumsum(rng.integers(-6, 7, (1 << 17, 64)), axis=0)
           % 256).astype(np.uint8)
    stream = encoder.compress(raw.reshape(-1), 64, codec="delta")
    payload = np.frombuffer(stream, np.uint8)
    cs = 128
    t = hf.build_table(payload)
    nsym = payload.size
    nch = max(1, -(-nsym // cs))
    enc = hf.get_encode_device()
    lut = jnp.asarray(hf.encode_lut_packed(t))
    syms = np.full((next_bucket(nch, 8), cs), 256, np.uint16)
    syms.reshape(-1)[:nsym] = payload
    sj = jnp.asarray(syms)
    for rep in range(3):
        tme = devloop_time(enc, (sj, lut), 8)
        print(f"  huff-enc scan8: {nsym / tme / 1e9:6.2f} GB/s "
              f"({tme * 1e6:.0f} us)", flush=True)

    s2 = encoder.compress(raw.reshape(-1), 64, codec="xff")
    ng, _, _ = read_metadata_rle(s2)
    idx = decoder.walk_headers(s2, ng, 64, 1, lowdim=False)
    d2 = decoder.gather_payloads(s2, idx, 64, 1, False)
    nd = next_bucket(d2.shape[0])
    dp = pad_rows(d2, nd)
    wp = pad_rows(idx.widths, nd)
    mb = dp.shape[2]
    dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
    wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))

    def kern(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d.reshape(nd, 8, mb), w.reshape(nd, 64), "xff", 1, False)

    for rep in range(3):
        tme = devloop_time(kern, (dfl, wfl), 16)
        print(f"  xff serial (prod, 8192 hint): "
              f"{raw.nbytes / tme / 1e9:6.2f} GB/s", flush=True)
    print("SESSION50 DONE", flush=True)


if __name__ == "__main__":
    main()
