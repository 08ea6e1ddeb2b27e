"""TPU session 28: block-diagonal MXU Pallas unpack (VERDICT r3 item 5b).

The headline decode's dominant HBM term is the (nb, MAXB, D) bf16 unpack
weight tensor (~16x payload; speed-of-light accounting in STATUS.md puts
the kernel at 54% of ceiling). unpack_rows_pallas_mxu builds both the
weights and a block-diagonal payload copy in VMEM per tile and runs ONE
(TB*8, TB*MAXB) @ (TB*MAXB, D) dot — HBM collapses to payload + packed
offsets + output.

Discipline (CLAUDE.md — faulting Pallas kernels wedge the chip for
hours): compile-only checks for every tb variant FIRST, then ONE guarded
runtime exactness check (device-side comparison, scalar fetch), timing
only after exactness, never loop over possibly-faulting variants.

Run:  timeout 5400 python -u tools/tpu_session28.py
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
    from sprintz_tpu.ops import pack
    from sprintz_tpu.ops.pack import unpack_rows_rowmajor
    from sprintz_tpu.ops.pallas_pack import unpack_rows_pallas_mxu
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    rng = np.random.default_rng(6)
    D = 64
    nrows = 1 << (10 if SMOKE else 17)  # 8 MiB u8 d64
    iters = 2 if SMOKE else 16

    raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % 256
           ).astype(np.uint8)
    s = encoder.compress(raw.reshape(-1), D, codec="delta")
    ng, _, _ = read_metadata_rle(s)
    idx = decoder.walk_headers(s, ng, D, 1, lowdim=False)
    assert idx.total_rows == idx.widths.shape[0] * 8, "want contiguous"
    dense = decoder.gather_payloads(s, idx, D, 1, False)
    nd_pad = next_bucket(dense.shape[0])
    dj = jnp.asarray(pad_rows(dense, nd_pad))  # uint8
    dj32 = dj.astype(jnp.int32)
    wj = jnp.asarray(pad_rows(idx.widths, nd_pad))
    nbytes = raw.nbytes
    print(f"stream: nb={dense.shape[0]} maxb={dense.shape[2]} "
          f"nd_pad={nd_pad}", flush=True)

    # ---------------- 1. baseline XLA unpack (isolated), same run
    t = devloop_time(unpack_rows_rowmajor, (dj32, wj), iters)
    print(f"unpack xla bf16      : {nbytes / t / 1e9:6.2f} GB/s", flush=True)

    # ---------------- 2. Pallas MXU unpack: compile-only ALL variants
    # (session-28a: u8 carrier fails — Mosaic has no u8->bf16 cast)
    variants = ([(8, "i8")] if SMOKE
                else [(tb, dt) for dt in ("i8", "bf16")
                      for tb in (8, 16, 32)])
    good = []
    for tb, dt in variants:
        try:
            f = jax.jit(lambda d, w, tb=tb, dt=dt: unpack_rows_pallas_mxu(
                d, w, tb=tb, interpret=SMOKE, in_dtype=dt))
            f.lower(dj, wj).compile()
            good.append((tb, dt))
            print(f"pallas-mxu tb={tb} {dt}: compiled ok", flush=True)
        except Exception as e:
            print(f"pallas-mxu tb={tb} {dt}: COMPILE FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    # ---------------- 3. ONE guarded runtime exactness check per carrier
    for dt in {d for _, d in good}:
        tb0 = min(tb for tb, d in good if d == dt)
        print(f"pallas-mxu tb={tb0} {dt}: guarded first run...", flush=True)

        @jax.jit
        def check(d, d32, w, tb0=tb0, dt=dt):
            a = unpack_rows_rowmajor(d32, w)
            b = unpack_rows_pallas_mxu(d, w, tb=tb0, interpret=SMOKE,
                                       in_dtype=dt)
            return jnp.all(a == b)

        ok = bool(check(dj, dj32, wj))
        print(f"pallas-mxu tb={tb0} {dt}: runtime ok, exact={ok}",
              flush=True)
        if not ok:
            good = [(tb, d) for tb, d in good if d != dt]

    # ---------------- 4. timing per variant (isolated kernel)
    for tb, dt in good:
        t2 = devloop_time(
            lambda d, w, tb=tb, dt=dt: unpack_rows_pallas_mxu(
                d, w, tb=tb, interpret=SMOKE, in_dtype=dt), (dj, wj), iters)
        print(f"unpack pallas-mxu tb={tb:3d} {dt:>4}: "
              f"{nbytes / t2 / 1e9:6.2f} GB/s", flush=True)

    # ---------------- 5. full decode pass A/B (unpack + zigzag + prefix)
    def full(d, w):
        return decoder._decode_pass_contiguous.__wrapped__(
            d, w, "delta", 1, False)

    t3 = devloop_time(full, (dj, wj), iters)
    print(f"full decode pass xla : {nbytes / t3 / 1e9:6.2f} GB/s",
          flush=True)
    if good:
        pack._USE_PALLAS = "mxu"  # default tb=16, in_dtype="i8"
        try:
            out_ref = np.asarray(full(dj, wj))[: idx.total_rows]
            ok = np.array_equal(out_ref.reshape(-1), raw.reshape(-1))
            print(f"full pass pallas-mxu exact={ok}", flush=True)
            if ok:
                t4 = devloop_time(full, (dj, wj), iters)
                print(f"full decode pass mxu : {nbytes / t4 / 1e9:6.2f} "
                      f"GB/s (tb=16 i8 default)", flush=True)
        finally:
            pack._USE_PALLAS = "0"

    print("SESSION28 DONE", flush=True)


if __name__ == "__main__":
    main()
