"""TPU session 52: nwin-2 + bf3 unpack A/B on the headline kernels.

The round-5 roofline pinned the headline decode's wall on the one-hot
weight BUILD (VPU op-count, not HBM). Two levers landed this session:

- UNPACK_NWIN auto: u8 streams build 2 byte windows instead of 3 (one
  less compare+select level over the (c, MAXB, D) weight; one less pack
  matmul on the encode side). Provably byte-identical.
- MXU_IMPL=bf3: ONE {0,1} byte-select one-hot (single compare) +
  byte-shifted payload copies on the dot's M axis (8 -> 8*nwin rows).

A/B grid (interleaved x2 reps, exactness jit-compared on device):
  A. u8 d64 8 MiB contiguous: full pass + isolated unpack under
     (bf16,3) [r5 production], (bf16,auto=2) [new default], (bf3,auto).
  B. u16 d64 8 MiB contiguous: full pass under (bf16,3) vs (bf3,3).
  C. u8 d64 encode pass: nwin 3 vs auto=2.

Run:  timeout 5400 python -u tools/tpu_session52.py
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

    rng = np.random.default_rng(52)

    def prep(elem_sz):
        eb = 8 * elem_sz
        dt = np.uint8 if elem_sz == 1 else np.uint16
        nr = (1 << 23) // elem_sz // 64
        raw = (np.cumsum(rng.integers(-6, 7, (nr, 64)), axis=0)
               % (1 << eb)).astype(dt)
        s = encoder.compress(raw.reshape(-1), 64, codec="delta",
                             elem_sz=elem_sz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, 64, elem_sz, lowdim=False)
        dense = decoder.gather_payloads(s, idx, 64, elem_sz, False)
        assert idx.total_rows == idx.widths.shape[0] * 8
        nd = next_bucket(dense.shape[0])
        dp = pad_rows(dense, nd)
        wp = pad_rows(idx.widths, nd)
        maxb = dp.shape[2]
        dfl = jnp.asarray(np.ascontiguousarray(dp).reshape(-1))
        wfl = jnp.asarray(np.ascontiguousarray(wp).reshape(-1))
        return raw, dfl, wfl, nd, maxb

    variants_u8 = [("bf16", "3"), ("bf16", "auto"), ("bf3", "auto")]

    def set_impl(impl, nw):
        pack.MXU_IMPL = impl
        pack.UNPACK_NWIN = nw
        jax.clear_caches()

    # ---------------- Part A: u8 d64 ----------------
    raw, dfl, wfl, nd, maxb = prep(1)
    nbytes = raw.nbytes
    print(f"-- A: u8 d64 8 MiB, nb {nd}, maxb {maxb}", flush=True)

    def full(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd, 8, maxb), wf.reshape(nd, 64), "delta", 1, False)

    def unp(df, wf):
        return pack.unpack_rows_rowmajor(
            df.reshape(nd, 8, maxb).astype(jnp.int32),
            wf.reshape(nd, 64).astype(jnp.int32), elem_sz=1)

    set_impl("bf16", "3")
    ref_full = jax.jit(full)(dfl, wfl)
    ref_full.block_until_ready()
    ref_unp = jax.jit(unp)(dfl, wfl)
    ref_unp.block_until_ready()
    for impl, nw in variants_u8[1:]:
        set_impl(impl, nw)
        try:
            okf = _eq(ref_full, jax.jit(full)(dfl, wfl))
            oku = _eq(ref_unp, jax.jit(unp)(dfl, wfl))
            print(f"  exact {impl}/{nw}: full={okf} unpack={oku}",
                  flush=True)
        except Exception as e:
            print(f"  exact {impl}/{nw}: DIED {type(e).__name__} "
                  f"{str(e)[:80]}", flush=True)
            jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    for rep in range(2):
        for impl, nw in variants_u8:
            set_impl(impl, nw)
            try:
                t = devloop_time(full, (dfl, wfl), 16)
                print(f"  u8 full {impl}/{nw}: "
                      f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)
            except Exception as e:
                print(f"  u8 full {impl}/{nw}: DIED {type(e).__name__} "
                      f"{str(e)[:80]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    for rep in range(2):
        for impl, nw in variants_u8:
            set_impl(impl, nw)
            try:
                t = devloop_time(unp, (dfl, wfl), 16)
                print(f"  u8 unpack {impl}/{nw}: "
                      f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)
            except Exception as e:
                print(f"  u8 unpack {impl}/{nw}: DIED {type(e).__name__} "
                      f"{str(e)[:80]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)

    # ---------------- Part B: u16 d64 ----------------
    raw16, dfl16, wfl16, nd16, maxb16 = prep(2)
    print(f"-- B: u16 d64 8 MiB, nb {nd16}, maxb {maxb16}", flush=True)

    def full16(df, wf):
        return decoder._decode_pass_contiguous.__wrapped__(
            df.reshape(nd16, 8, maxb16), wf.reshape(nd16, 64),
            "delta", 2, False)

    set_impl("bf16", "auto")
    ref16 = jax.jit(full16)(dfl16, wfl16)
    ref16.block_until_ready()
    set_impl("bf3", "auto")
    try:
        print(f"  exact bf3 u16: {_eq(ref16, jax.jit(full16)(dfl16, wfl16))}",
              flush=True)
    except Exception as e:
        print(f"  exact bf3 u16: DIED {type(e).__name__} {str(e)[:80]}",
              flush=True)
        jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    for rep in range(2):
        for impl in ("bf16", "bf3"):
            set_impl(impl, "auto")
            try:
                t = devloop_time(full16, (dfl16, wfl16), 16)
                print(f"  u16 full {impl}: "
                      f"{raw16.nbytes / t / 1e9:6.2f} GB/s", flush=True)
            except Exception as e:
                print(f"  u16 full {impl}: DIED {type(e).__name__} "
                      f"{str(e)[:80]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)

    # ---------------- Part C: u8 encode pass ----------------
    print("-- C: u8 d64 encode pass, nwin 3 vs auto", flush=True)
    rows_j = jnp.asarray(raw.astype(np.int32))

    def kern_e(r):
        return encoder._encode_pass.__wrapped__(r, "delta", 1, False)

    set_impl("bf16", "3")
    ref_e = jax.jit(kern_e)(rows_j)
    jax.block_until_ready(ref_e)
    set_impl("bf16", "auto")
    got_e = jax.jit(kern_e)(rows_j)
    jax.block_until_ready(got_e)
    leaves_r = jax.tree_util.tree_leaves(ref_e)
    leaves_g = jax.tree_util.tree_leaves(got_e)
    ok = all(_eq(a, b) for a, b in zip(leaves_r, leaves_g))
    print(f"  encode outputs identical: {ok}", flush=True)
    for rep in range(2):
        for nw in ("3", "auto"):
            set_impl("bf16", nw)
            try:
                t = devloop_time(kern_e, (rows_j,), 16)
                print(f"  u8 encode nwin={nw}: "
                      f"{nbytes / t / 1e9:6.2f} GB/s", flush=True)
            except Exception as e:
                print(f"  u8 encode nwin={nw}: DIED {type(e).__name__} "
                      f"{str(e)[:80]}", flush=True)
                jax.block_until_ready(jnp.zeros((8, 128), jnp.int32) + 1)
    set_impl("bf16", "auto")
    print("SESSION52 DONE", flush=True)


if __name__ == "__main__":
    main()
