"""TPU session 39: lowdim unpack formulation hunt (the session-38 pin).

Session-38 isolation: grouped unpack 2.14 GB/s vs finish 24 — the
unpack IS the small-d decode ceiling. A/B the (un)pack impls INSIDE the
grouped layout (every N-scale tensor (c, 8, ~128)):

Sections (env SPRINTZ_SESSION_SEC):
  iso   - isolated grouped unpack: einsum / einsum2 / jsel / wselect /
          dyn at d4 u8 and d2 u16 (exactness vs einsum first)
  isop  - isolated grouped pack (encode twin): einsum / jsel / wselect
  full  - full decode pass d3/d4 and encode pass d3/d4 with the
          einsum baseline vs jsel

Run:  timeout 5400 python -u tools/tpu_session39.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SMOKE = os.environ.get("SPRINTZ_SESSION_SMOKE") == "1"
SECS = os.environ.get("SPRINTZ_SESSION_SEC", "iso,isop,full").split(",")

# einsum2 LAST: something in this section dies UNAVAILABLE on the
# second variant's result (4 runs); the loop now survives and
# attributes failures per-impl, but keep the suspect at the end.
DEC_IMPLS = ("einsum", "jsel", "wselect", "dyn", "einsum2")
PACK_IMPLS = ("einsum", "jsel", "wselect")


def _eq_device(a, b) -> bool:
    """Device-side equality: ONE bool scalar crosses the relay (a full
    array pull is minutes at the relay's MB/s) — and the comparison MUST
    be jitted: EAGER jnp ops through axon dispatch per-op and took 330 s
    (sometimes timing out as UNAVAILABLE) on 34 MB operands."""
    import jax
    import jax.numpy as jnp

    return bool(jax.jit(jnp.array_equal)(a, b))


def _grouped_inputs(rng, D, esz, c):
    """Random (c*g, D, EB) dense + legal widths, grouped-view arrays."""
    from sprintz_tpu.ops.pack import _lowdim_widths, lowdim_group

    eb = 8 * esz
    g = lowdim_group(D)
    legal = np.array(_lowdim_widths(eb) + [0])
    widths = legal[rng.integers(0, len(legal), (c * g, D))].astype(np.int32)
    dense = rng.integers(0, 256, (c * g, D, eb)).astype(np.int32)
    return dense, widths, g, eb


def sec_iso(rng, iters):
    import jax
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu.ops import pack

    shapes = [(4, 1)] if SMOKE else [(4, 1), (2, 2)]
    c = 1 << (4 if SMOKE else 13)
    for D, esz in shapes:
        dense, widths, g, eb = _grouped_inputs(rng, D, esz, c)
        dj = jnp.asarray(dense.reshape(c, g * D, eb))
        wj = jnp.asarray(widths.reshape(c, g * D))
        nbytes = c * g * 8 * D * esz
        ref = None
        res = {i: [] for i in DEC_IMPLS}
        dead = set()
        prev = pack.LOWDIM_IMPL
        try:
            for rep in range(2):
                for impl in DEC_IMPLS:
                    if impl in dead:
                        continue
                    pack.LOWDIM_IMPL = impl

                    def kern(d, w):
                        return pack.unpack_dims_lowdim(d, w)

                    try:
                        if rep == 0:
                            out = jax.jit(kern)(dj, wj)
                            out.block_until_ready()
                            print(f"  {impl}: ran", flush=True)
                            if ref is None:
                                ref = out
                            elif not _eq_device(out, ref):
                                print(f"d{D}u{8*esz} unpack {impl}: "
                                      "NOT EXACT", flush=True)
                                dead.add(impl)
                                continue
                        t = devloop_time(kern, (dj, wj), iters)
                        res[impl].append(nbytes / t / 1e9)
                        print(f"  {impl}: rep{rep} "
                              f"{res[impl][-1]:.2f} GB/s", flush=True)
                    except Exception as e:  # attribute + survive
                        dead.add(impl)
                        print(f"d{D}u{8*esz} unpack {impl}: DIED "
                              f"{type(e).__name__}: {str(e)[:80]}",
                              flush=True)
                        jax.block_until_ready(
                            jnp.zeros((8, 128), jnp.int32) + 1)
                        print("  (device probe ok, continuing)",
                              flush=True)
        finally:
            pack.LOWDIM_IMPL = prev
        for impl, rs in res.items():
            print(f"d{D} u{8*esz} unpack {impl:>7}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)


def sec_isop(rng, iters):
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu.ops import pack

    shapes = [(4, 1)] if SMOKE else [(4, 1), (2, 2)]
    c = 1 << (4 if SMOKE else 13)
    for D, esz in shapes:
        dense, widths, g, eb = _grouped_inputs(rng, D, esz, c)
        # errs consistent with widths (masked), packed via grouped view
        errs = (dense[:, :, 0] & ((1 << widths) - 1))
        errs8 = np.repeat(errs[:, None, :], 8, axis=1).astype(np.int32)
        ej = jnp.asarray(errs8.reshape(c * g, 8, D))
        wj = jnp.asarray(widths)
        nbytes = c * g * 8 * D * esz
        ref = None
        res = {i: [] for i in PACK_IMPLS}
        prev = pack.LOWDIM_IMPL
        try:
            for rep in range(2):
                for impl in PACK_IMPLS:
                    pack.LOWDIM_IMPL = impl

                    def kern(e, w):
                        return pack.pack_dims_lowdim_grouped(e, w, esz)

                    if rep == 0:
                        import jax

                        out = jax.jit(kern)(ej, wj)
                        if ref is None:
                            ref = out
                        elif not _eq_device(out, ref):
                            print(f"d{D}u{8*esz} pack {impl}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (ej, wj), iters)
                    res[impl].append(nbytes / t / 1e9)
        finally:
            pack.LOWDIM_IMPL = prev
        for impl, rs in res.items():
            print(f"d{D} u{8*esz} pack {impl:>7}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)


def sec_full(rng, iters):
    import jax.numpy as jnp

    from bench import devloop_time
    from sprintz_tpu import decoder, encoder
    from sprintz_tpu.golden.stream import read_metadata_rle
    from sprintz_tpu.ops import pack
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    shapes = [(3, 1)] if SMOKE else [(3, 1), (4, 1), (2, 2)]
    for D, esz in shapes:
        dt = np.uint8 if esz == 1 else np.uint16
        nrows = (1 << (12 if SMOKE else 23)) // esz // D
        nrows -= nrows % 8
        raw = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0)
               % (1 << (8 * esz))).astype(dt)
        s = encoder.compress(raw.reshape(-1), D, codec="delta",
                             elem_sz=esz)
        ng, _, _ = read_metadata_rle(s)
        idx = decoder.walk_headers(s, ng, D, esz, lowdim=True)
        d2 = decoder.gather_payloads(s, idx, D, esz, True)
        if idx.total_rows != idx.widths.shape[0] * 8:
            print(f"d{D}: stream has runs, skipping", flush=True)
            continue
        nd = next_bucket(d2.shape[0])
        dj = jnp.asarray(pad_rows(d2, nd))
        wj = jnp.asarray(pad_rows(idx.widths, nd))

        import jax

        rawj = jnp.asarray(raw[: idx.total_rows])
        cases = [("grouped", "einsum"), ("grouped", "jsel"),
                 ("legacy", "einsum"), ("legacy", "jsel")]
        res = {p: [] for p in cases}
        prev = decoder.LOWDIM_PASS, pack.LOWDIM_IMPL
        try:
            for rep in range(2):
                for lp, impl in cases:
                    decoder.LOWDIM_PASS = lp
                    pack.LOWDIM_IMPL = impl

                    def kern(d, w):
                        return decoder._decode_pass_contiguous.__wrapped__(
                            d, w, "delta", esz, True)

                    if rep == 0:
                        out = jax.jit(kern)(dj, wj)[: idx.total_rows]
                        if not _eq_device(out, rawj):
                            print(f"d{D} dec {lp}/{impl}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (dj, wj), iters)
                    res[(lp, impl)].append(raw.nbytes / t / 1e9)
        finally:
            decoder.LOWDIM_PASS, pack.LOWDIM_IMPL = prev
        for (lp, impl), rs in res.items():
            print(f"d{D} u{8*esz} dec {lp:>7}/{impl:>6}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)

        # encode pass: grouped einsum vs jsel (+ dmajor reference)
        encs = [("grouped", "einsum"), ("grouped", "jsel")]
        if D * esz in (1, 2, 4):
            encs.append(("dmajor", "einsum"))
        res = {e: [] for e in encs}
        rows_j = jnp.asarray(raw.astype(np.int32))
        prev2 = encoder.LOWDIM_ENCODE, pack.LOWDIM_IMPL
        ref_sig = None
        try:
            for rep in range(2):
                for le, impl in encs:
                    encoder.LOWDIM_ENCODE = le
                    pack.LOWDIM_IMPL = impl

                    def kern(r):
                        return encoder._encode_pass.__wrapped__(
                            r, "delta", esz, True)

                    if rep == 0:
                        w_, h_, de_, ws_ = jax.jit(kern)(rows_j)
                        sig = (w_.astype(jnp.int32),
                               de_.astype(jnp.int32)[:, :w_.shape[1]])
                        if ref_sig is None:
                            ref_sig = sig
                        elif not all(_eq_device(a, b) for a, b
                                     in zip(sig, ref_sig)):
                            print(f"d{D} enc {le}/{impl}: NOT EXACT",
                                  flush=True)
                            continue
                    t = devloop_time(kern, (rows_j,), iters)
                    res[(le, impl)].append(raw.nbytes / t / 1e9)
        finally:
            encoder.LOWDIM_ENCODE, pack.LOWDIM_IMPL = prev2
        for (le, impl), rs in res.items():
            print(f"d{D} u{8*esz} enc {le:>7}/{impl:>6}: "
                  + " ".join(f"{r:6.2f}" for r in rs) + " GB/s", flush=True)


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

    rng = np.random.default_rng(39)
    iters = 2 if SMOKE else 16
    for sec in SECS:
        print(f"==== section {sec} ====", flush=True)
        globals()[f"sec_{sec}"](rng, iters)
    print("SESSION39 DONE", flush=True)


if __name__ == "__main__":
    main()
