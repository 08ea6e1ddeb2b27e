"""TPU session 57: rowmajor fold A/B at d32 (the untested fold cell).

SPRINTZ_ROWMAJOR_FOLD folds G = 128/D blocks into one 128-lane virtual
block. Its only recorded device point is d64 (g=2): a wash — the g x
larger one-hot window cancels the halved lane pad. d32 (g=4, unfolded
tensors pad 4x) was never measured; d8/d16 are wordsel cells where the
fold would forfeit the matmul-free route (virtual maxb >= 64).

Run:  timeout 1800 python -u tools/tpu_session57.py
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
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(57)
    D, esz = 32, 1
    nr = (1 << 23) // D
    raw = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
           % 256).astype(np.uint8)
    s = encoder.compress(raw.reshape(-1), D, codec="delta")
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, D, esz, lowdim=False)
    dense = decoder.gather_payloads(s, idx, D, esz, False)
    nd = next_bucket(dense.shape[0])
    dp = pad_rows(dense, nd)
    wp = pad_rows(idx.widths, nd)
    mb = dp.shape[2]
    dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
    wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
    print(f"-- d32 u8, nb {nd}, maxb {mb}, g=4", flush=True)

    def full(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd, 8, mb), wf.reshape(nd, D), "delta", esz, False)

    decoder.ROWMAJOR_FOLD = False
    jax.clear_caches()
    ref = jax.jit(full)(dfl, wfl)
    ref.block_until_ready()
    decoder.ROWMAJOR_FOLD = True
    jax.clear_caches()
    print(f"  fold exact: {_eq(ref, jax.jit(full)(dfl, wfl))}", flush=True)
    for rep in range(2):
        for flag in (False, True):
            decoder.ROWMAJOR_FOLD = flag
            jax.clear_caches()
            t = devloop_time(full, (dfl, wfl), 16)
            print(f"  d32 fold={int(flag)}: {raw.nbytes / t / 1e9:6.2f} GB/s",
                  flush=True)
    decoder.ROWMAJOR_FOLD = False
    jax.clear_caches()
    print("SESSION57 DONE", flush=True)


if __name__ == "__main__":
    main()
