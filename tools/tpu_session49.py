"""TPU session 49: verify the u16-param +Huf encode rate; xff-serial
_CHUNK drift A/B (the envelope guard's 2.15 -> 1.92 flag).

Run:  timeout 3600 python -u tools/tpu_session49.py
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
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(49)
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
    for dt, tag in [(np.uint16, "u16"), (np.int32, "i32")]:
        syms = np.full((next_bucket(nch, 8), cs), 256, dt)
        syms.reshape(-1)[:nsym] = payload
        sj = jnp.asarray(syms)
        for rep in range(2):
            tme = devloop_time(enc, (sj, lut), 8)
            print(f"  huff-enc syms={tag}: {nsym / tme / 1e9:6.2f} GB/s "
                  f"({tme * 1e6:.0f} us)", flush=True)

    # xff serial contiguous decode: _CHUNK 8192 vs 16384
    s2 = encoder.compress(raw.reshape(-1), 64, codec="xff")
    ng, _, _ = read_metadata_rle(s2)
    idx = decoder.walk_headers(s2, ng, 64, 1, lowdim=False)
    d2 = decoder.gather_payloads(s2, idx, 64, 1, False)
    assert idx.total_rows == idx.widths.shape[0] * 8
    nd = next_bucket(d2.shape[0])
    dp = pad_rows(d2, nd)
    wp = pad_rows(idx.widths, nd)
    mb = dp.shape[2]
    dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
    wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))

    def kern(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d.reshape(nd, 8, mb), w.reshape(nd, 64), "xff", 1, False)

    for chunk in (8192, 16384):
        pack._CHUNK = chunk
        jax.clear_caches()
        for rep in range(2):
            tme = devloop_time(kern, (dfl, wfl), 16)
            print(f"  xff serial chunk={chunk}: "
                  f"{raw.nbytes / tme / 1e9:6.2f} GB/s", flush=True)
    pack._CHUNK = 16384
    print("SESSION49 DONE", flush=True)


if __name__ == "__main__":
    main()
