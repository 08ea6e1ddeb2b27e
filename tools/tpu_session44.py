"""TPU session 44: +Huf device ENCODE profile + variants (VERDICT item 8).

Encode is 7.1 GB/s vs decode 14.3 and plain encode 28.7. Profile first:

  lut16    - isolated (code,len) lookup, bitslice-16 (production: ~200
             elementwise ops/symbol)
  lut8x2   - isolated lookup as TWO byte-LUT flat selects (~132 ops)
  scan1    - isolated append scan, 1 symbol/step (production), fed the
             packed lookup results already on device
  scan2    - append scan, 2 symbols/step (the decode kernel's trick:
             halves scan steps; each append still flushes <= 1 u16)
  full     - production encode_device
  full2    - byte-LUT lookup + 2-sym scan

Exactness: full2's emitted words/acc/nbits are compared on device
against production; one host assembly equality check against
huff_compress bytes.

Run:  timeout 5400 python -u tools/tpu_session44.py
Smoke: SPRINTZ_SESSION_SMOKE=1 python tools/tpu_session44.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"


def _eq(a, b) -> bool:
    import jax
    import jax.numpy as jnp

    return bool(jax.jit(jnp.array_equal)(a, b))


def main():
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import encoder
    from sprintz_tpu.entropy import huffman as hf
    from sprintz_tpu.utils.shapes import next_bucket

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s: {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(44)
    iters = 2 if SMOKE else 16
    cs = 128
    nrows = 1 << (10 if SMOKE else 17)
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, 64)), axis=0)
           % 256).astype(np.uint8)
    stream = encoder.compress(raw.reshape(-1), 64, codec="delta")
    payload = np.frombuffer(stream, np.uint8)
    t = hf.build_table(payload)
    n = payload.size
    nchunks = max(1, -(-n // cs))
    nc_pad = next_bucket(nchunks, 8)
    syms = np.full((nc_pad, cs), 256, np.int32)
    syms.reshape(-1)[:n] = payload
    syms_j = jnp.asarray(syms)
    lut16 = jnp.asarray(hf.encode_lut_packed(t))
    # byte LUTs of packed = code | len << 12 (lo and hi byte)
    packed_np = t.codes.astype(np.int64) | (t.lengths.astype(np.int64) << 12)
    lut_lo = jnp.asarray(hf.pack_byte_lut((packed_np & 0xFF).astype(np.int64)))
    lut_hi = jnp.asarray(hf.pack_byte_lut((packed_np >> 8).astype(np.int64)))
    print(f"-- payload {n} bytes, {nchunks} chunks (pad {nc_pad})",
          flush=True)

    def lookup16(s):
        return jnp.where(s > 255, 0, hf._bitslice_lookup(s & 255, lut16, 16))

    def lookup8x2(s):
        lo = hf._byte_lookup(s & 255, lut_lo)
        hi = hf._byte_lookup(s & 255, lut_hi)
        return jnp.where(s > 255, 0, lo | (hi << 8))

    a = jax.jit(lookup16)(syms_j)
    a.block_until_ready()
    b = jax.jit(lookup8x2)(syms_j)
    print(f"  lut8x2 exact: {_eq(a, b)}", flush=True)
    packed_j = a  # stays on device for the isolated scans

    C = nc_pad

    def scan_body(acc, nbits, p):
        code = (p & 0xFFF).astype(jnp.uint32)
        ln = p >> 12
        acc = acc | (code << nbits.astype(jnp.uint32))
        nbits = nbits + ln
        flush = nbits >= 16
        word = (acc & 0xFFFF).astype(jnp.int32)
        acc = jnp.where(flush, acc >> 16, acc)
        nbits = jnp.where(flush, nbits - 16, nbits)
        return acc, nbits, word | (flush.astype(jnp.int32) << 16)

    def scan1(packed):
        xs = packed.T

        def step(carry, p):
            acc, nbits, word = scan_body(carry[0], carry[1], p)
            return (acc, nbits), word

        (acc, nbits), words = jax.lax.scan(
            step, (jnp.zeros(C, jnp.uint32), jnp.zeros(C, jnp.int32)), xs)
        return words, acc.astype(jnp.int32), nbits

    def scan2(packed):
        xs = packed.T.reshape(cs // 2, 2, C)

        def step(carry, p2):
            acc, nbits = carry
            acc, nbits, w0 = scan_body(acc, nbits, p2[0])
            acc, nbits, w1 = scan_body(acc, nbits, p2[1])
            return (acc, nbits), jnp.stack([w0, w1])

        (acc, nbits), words = jax.lax.scan(
            step, (jnp.zeros(C, jnp.uint32), jnp.zeros(C, jnp.int32)), xs)
        return (words.reshape(cs, C), acc.astype(jnp.int32), nbits)

    def full1(s):
        return hf.get_encode_device()(s, lut16)

    def full2(s):
        return scan2(lookup8x2(s))

    r1 = jax.jit(scan1)(packed_j)
    jax.block_until_ready(r1)
    r2 = jax.jit(scan2)(packed_j)
    ok = all(_eq(x, y) for x, y in zip(r1, r2))
    print(f"  scan2 exact: {ok}", flush=True)
    f1 = jax.jit(full1)(syms_j)
    f2 = jax.jit(full2)(syms_j)
    ok = all(_eq(x, y) for x, y in zip(f1, f2))
    print(f"  full2 exact: {ok}", flush=True)
    # host-assembly byte identity on one call
    ref_bytes = hf.huff_compress(payload, chunk_symbols=cs,
                                 allow_stored=False)
    got = hf._assemble_device_encode(
        np.asarray(f2[0]), np.asarray(f2[1]), np.asarray(f2[2]),
        n, cs, nchunks, t)
    print(f"  full2 bytes == huff_compress: {got == ref_bytes}",
          flush=True)

    for rep in range(2):
        for name, fn, args in [
                ("lut16", lookup16, (syms_j,)),
                ("lut8x2", lookup8x2, (syms_j,)),
                ("scan1", scan1, (packed_j,)),
                ("scan2", scan2, (packed_j,)),
                ("full1", full1, (syms_j,)),
                ("full2", full2, (syms_j,)),
        ]:
            try:
                tme = devloop_time(fn, args, iters)
                print(f"  {name:>7}: {n / tme / 1e9:6.2f} GB/s "
                      f"({tme * 1e6:.0f} us)", flush=True)
            except Exception as e:
                print(f"  {name:>7}: DIED {type(e).__name__} "
                      f"{str(e)[:70]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    print("SESSION44 DONE", flush=True)


if __name__ == "__main__":
    main()
