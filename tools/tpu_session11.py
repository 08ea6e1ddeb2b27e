"""TPU session 11: dynshift lowdim A/B + tile-padding shape probes.

Session-9 verdict: the width-stratified dmajor decode (strata) loses to
legacy by op count (~200 small ops); dmajor encode WINS 2x. Session-11
tests the third decode formulation (dynshift: per-element variable
shifts, no width unroll, ~1/8 the ops) against both, picks production
defaults, and maps the raw tile-padding cost rules (session-10 grid)
that the layouts rely on.

Run detached:  nohup python -u tools/tpu_session11.py > /tmp/tpu_session11.log 2>&1 &
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

    rng = np.random.default_rng(0)
    nrl = 1 << 13 if SMOKE else 1 << 20
    rawl8 = (np.cumsum(rng.integers(-6, 7, (nrl, 4)), axis=0) % 256
             ).astype(np.uint8)
    rawl16 = (np.cumsum(rng.integers(-300, 301, (nrl, 2)), axis=0)
              % 65536).astype(np.uint16)
    rawl1 = (np.cumsum(rng.integers(-6, 7, (nrl, 1)), axis=0) % 256
             ).astype(np.uint8)

    def prep(raw, D, elem_sz):
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, elem_sz, lowdim=True)
        dense = decoder.gather_payloads(s, idx, D, elem_sz, True)
        nd = next_bucket(dense.shape[0])
        dj = jnp.asarray(pad_rows(dense, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))
        return idx, dj, wj

    def check_time(tag, kern, args, raw, nrows_packed, iters=16):
        got = np.asarray(jax.jit(kern)(*args))
        ok = np.array_equal(got[:nrows_packed].astype(np.int64),
                            raw[:nrows_packed].astype(np.int64))
        if SMOKE:
            print(f"{tag:52s} exact={ok}  (smoke)", flush=True)
            assert ok, tag
            return
        t = devloop_time(kern, args, iters)
        print(f"{tag:52s} exact={ok}  {t * 1e6:9.1f} us  "
              f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)

    VARIANTS = ((False, None, "legacy"), (True, "dyn", "dynshift"),
                (True, "strata", "strata"))

    # ---- decode 3-way A/B ---------------------------------------------
    for raw, D, esz, tag in ((rawl8, 4, 1, "d4 u8"),
                             (rawl16, 2, 2, "d2 u16"),
                             (rawl1, 1, 1, "d1 u8")):
        idx, dj, wj = prep(raw, D, esz)

        def kern(d, w, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", esz, True)

        for flag, impl, name in VARIANTS:
            decoder.LOWDIM_DMAJOR = flag
            if impl is not None:
                decoder.LOWDIM_DMAJOR_IMPL = impl
            jax.clear_caches()
            check_time(f"delta {tag} lowdim decode [{name}]",
                       kern, (dj, wj), raw, idx.total_rows)

    # ---- encode 3-way A/B ---------------------------------------------
    for raw, esz, tag in ((rawl8, 1, "d4 u8"), (rawl16, 2, "d2 u16"),
                          (rawl1, 1, "d1 u8")):
        rows = jnp.asarray(raw)

        def kern(r, esz=esz):
            w, h, d, s = encoder._encode_pass.__wrapped__(
                r, "delta", esz, True)
            return w.astype(jnp.int32), h.astype(jnp.int32), d, s

        outs = {}
        for flag, impl, name in VARIANTS:
            encoder.LOWDIM_DMAJOR = flag
            if impl is not None:
                encoder.LOWDIM_DMAJOR_IMPL = impl
            jax.clear_caches()
            outs[name] = [np.asarray(o) for o in jax.jit(kern)(rows)]
            ok = all(np.array_equal(a, b) for a, b in
                     zip(outs["legacy"], outs[name]))
            if SMOKE:
                print(f"encode {tag} [{name}]: exact={ok} (smoke)",
                      flush=True)
                assert ok
                continue
            t = devloop_time(kern, (rows,), 16)
            print(f"lowdim encode pass {tag} [{name}]  exact={ok}  "
                  f"{t * 1e6:9.1f} us  {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)

    # ---- session-10 probes: elementwise cost vs shape ------------------
    n = 1 << 18 if SMOKE else 1 << 24
    nbytes = n * 4
    base = np.arange(n, dtype=np.int32)

    def chain(x):
        for k in range(5):
            x = (x >> 1) ^ (x + k)
            x = jnp.where((x & 7) == k, x + 1, x)
        return x

    shapes = [
        (n,), (1, n), (2, n // 2), (4, n // 4), (8, n // 8),
        (32, n // 32), (256, n // 256),
        (n // 4, 4), (n // 8, 8), (n // 128, 128),
        (4, n // 32, 8), (4, 8, n // 32), (8, 4, n // 32),
    ]
    for shp in shapes:
        x = jnp.asarray(base.reshape(shp))
        if SMOKE:
            jax.block_until_ready(jax.jit(chain)(x))
            print(f"{str(shp):20s} ok (smoke)", flush=True)
            continue
        t = devloop_time(chain, (x,), 32, chain=True)
        print(f"{str(shp):20s} {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:7.2f} GB/s-equiv", flush=True)

    for a in ((1 << 17, 8), (8, 1 << 17), (1 << 17, 2), (1 << 15, 128)):
        x = jnp.asarray(np.arange(a[0] * a[1], dtype=np.int32).reshape(a))

        def tr(x):
            return jnp.swapaxes(x, -1, -2) + 1

        if SMOKE:
            jax.block_until_ready(jax.jit(tr)(x))
            print(f"transpose {a} ok (smoke)", flush=True)
            continue
        t = devloop_time(tr, (x,), 32)
        print(f"transpose {str(a):14s} {t * 1e6:9.1f} us  "
              f"{x.nbytes / t / 1e9:7.2f} GB/s", flush=True)

    print("SESSION11 DONE", flush=True)


if __name__ == "__main__":
    main()
