"""TPU session 56: weight-layout (transpose vs dot) A/B at maxb 16.

Session 55 showed the maxb-16 cells (d17-d33 u8) did not gain from the
2-window weight: their (c, D, 16) weight tensor's minor dim pads 8x, so
the build is PAD-dominated. The existing UNPACK_WLAYOUT="dot" variant
builds the weight directly as (c, MAXB, D) — minor D (31-33 -> pads to
128, 4x) instead of minor MAXB=16 (8x). Session 43 measured dot a wash
at d64 (maxb 32: 4x vs 2x pad); the maxb-16 octave was never A/B'd.

Cells: u8 d31/d32/d33/d17 (maxb 16), u16 d16 (maxb 32) — full decode
pass, auto(transpose) vs dot, x2 interleaved, exactness checked.

Run:  timeout 3600 python -u tools/tpu_session56.py
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
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    t0 = time.time()
    print("claiming device...", flush=True)
    jax.block_until_ready(jnp.zeros((128, 128), jnp.int32) + 1)
    print(f"claimed+warm in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(56)

    for D, esz in [(31, 1), (32, 1), (33, 1), (17, 1), (16, 2)]:
        eb = 8 * esz
        dt = np.uint8 if esz == 1 else np.uint16
        nr = (1 << 23) // esz // D
        nr -= nr % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nr, D)), axis=0)
               % (1 << eb)).astype(dt)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=False)
        dense = decoder.gather_payloads(s, idx, D, esz, False)
        nd = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd)
        wp = pad_rows(idx.widths, nd)
        mb = dp.shape[2]
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        print(f"-- d{D} u{eb}, nb {nd}, maxb {mb}", flush=True)

        def full(df, wf, nd=nd, mb=mb, D=D, esz=esz):
            return decoder._decode_pass_contiguous.__wrapped__(
                df.reshape(nd, 8, mb), wf.reshape(nd, D), "delta", esz,
                False)

        pack.UNPACK_WLAYOUT = "auto"
        jax.clear_caches()
        ref = jax.jit(full)(dfl, wfl)
        ref.block_until_ready()
        pack.UNPACK_WLAYOUT = "dot"
        jax.clear_caches()
        print(f"  dot exact: {_eq(ref, jax.jit(full)(dfl, wfl))}",
              flush=True)
        for rep in range(2):
            for lay in ("auto", "dot"):
                pack.UNPACK_WLAYOUT = lay
                jax.clear_caches()
                t = devloop_time(full, (dfl, wfl), 16)
                print(f"  d{D}u{eb} {lay:>5}: "
                      f"{raw.nbytes / t / 1e9:6.2f} GB/s", flush=True)
        pack.UNPACK_WLAYOUT = "auto"
        jax.clear_caches()
    print("SESSION56 DONE", flush=True)


if __name__ == "__main__":
    main()
