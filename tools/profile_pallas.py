"""On-chip comparison: XLA contiguous decode vs fused Pallas pipeline,
with a block-tile sweep, u8 and u16. Run: python tools/profile_pallas.py"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from bench import devloop_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sprintz_tpu import decoder
    from sprintz_tpu.models.forecasters import delta_encode
    from sprintz_tpu.ops.bitmath import block_widths_rowmajor
    from sprintz_tpu.ops.pack import pack_rows_rowmajor
    from sprintz_tpu.ops.pallas_decode import (
        decode_delta_contiguous, prefix_finish, unpack_zz)

    print(f"device: {jax.devices()[0]}", flush=True)
    _ = devloop_time(lambda x: x + 1, (jnp.zeros((128, 128), jnp.int32),), 4)

    rng = np.random.default_rng(0)
    for eb, D, nrows in [(8, 64, 1 << 17), (16, 64, 1 << 16)]:
        hi = 1 << eb
        vals = (np.cumsum(rng.integers(-6, 7, (nrows, D)), axis=0) % hi)
        nbytes = nrows * D * (eb // 8)
        nb = nrows // 8
        rows = jnp.asarray(vals, jnp.int32)
        errs = delta_encode(rows, eb)
        blocks = errs.reshape(nb, 8, D)
        ormask = jnp.bitwise_or.reduce(blocks, axis=1)
        widths = block_widths_rowmajor(ormask, eb // 8)
        dense = pack_rows_rowmajor(blocks, widths, eb // 8).astype(jnp.uint8)
        print(f"--- eb={eb} D={D} rows={nrows} ({nbytes >> 20} MiB)",
              flush=True)

        # reference XLA contiguous pass
        def xla_pass(d, w):
            return decoder._decode_pass_contiguous.__wrapped__(
                d, w, "delta", eb // 8, False)

        t = devloop_time(xla_pass, (dense, widths), 16)
        print(f"  xla_contiguous      {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:7.2f} GB/s", flush=True)

        for bt in (16, 32, 64, 128):
            def pallas_pass(d, w, bt=bt):
                return decode_delta_contiguous(d, w, eb, block_tile=bt,
                                               interpret=False)

            try:
                t = devloop_time(pallas_pass, (dense, widths), 16)
                ok = np.array_equal(
                    np.asarray(pallas_pass(dense, widths)).astype(np.int64),
                    vals)
                print(f"  pallas_fused bt={bt:<4d}{t * 1e6:9.1f} us  "
                      f"{nbytes / t / 1e9:7.2f} GB/s  exact={ok}",
                      flush=True)
            except Exception as e:
                print(f"  pallas_fused bt={bt} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        # stage split at bt=32
        def k1(d, w):
            return unpack_zz(d, w, eb, tile=32, interpret=False)

        t = devloop_time(k1, (dense, widths), 16)
        print(f"  k1_unpack_zz        {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:7.2f} GB/s", flush=True)

        bz, tots = unpack_zz(dense, widths, eb, tile=32, interpret=False)
        toff = jnp.cumsum(tots, axis=0, dtype=jnp.int32) - tots
        bzr = bz.reshape(nb * 8, D)

        def k2(b, o):
            return prefix_finish(b, o, eb, 256, interpret=False)

        t = devloop_time(k2, (bzr, toff), 16)
        print(f"  k2_prefix_finish    {t * 1e6:9.1f} us  "
              f"{nbytes / t / 1e9:7.2f} GB/s", flush=True)


if __name__ == "__main__":
    main()
