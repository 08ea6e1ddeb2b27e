"""Encoder pipeline stage breakdown (VERDICT r1 weak #2 tail / item 8).

Stages of encoder.compress:
  1. host->device transfer of rows        (relay-bound on axon)
  2. device _encode_pass                  (forecast + widths + pack)
  3. device->host transfer of outputs     (relay-bound on axon)
  4. host build_plan (native C++)         (RLE/group emission plan)
  5. host assemble_stream (native C++)    (headers, varints, payloads)

Run `python tools/profile_encode.py` (add JAX_PLATFORMS=cpu for
host-only numbers; stages 4-5 are device-independent).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os

    import jax

    if os.environ.get("SPRINTZ_PROFILE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sprintz_tpu import encoder
    from sprintz_tpu.planner import build_plan
    from sprintz_tpu.utils.shapes import next_bucket, pad_rows

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    ndims = 64
    nrows = 1 << 17
    raw = (np.cumsum(rng.integers(-6, 7, (nrows, ndims)), axis=0) % 256
           ).astype(np.uint8)
    flat = raw.reshape(-1)
    nbytes = flat.nbytes
    n = flat.size
    nb_max = n // (8 * ndims)
    nb_pad = next_bucket(nb_max)
    rows = pad_rows(flat.reshape(-1, ndims), nb_pad * 8)

    def stage(name, fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{name:34s} {t * 1e3:9.1f} ms  {nbytes / t / 1e9:7.2f} GB/s",
              flush=True)
        return out

    # 1. transfer up
    rows_j = stage("h2d_transfer_rows", lambda: jax.block_until_ready(
        jax.device_put(jnp.asarray(rows))))

    # 2. device pass (compile excluded via warmup)
    _ = jax.block_until_ready(encoder._encode_pass(rows_j, "delta", 1, False))

    def devpass():
        return jax.block_until_ready(
            encoder._encode_pass(rows_j, "delta", 1, False))

    widths, hdr, dense, width_sums = stage("device_encode_pass", devpass)

    # 3. transfer down
    outs = stage("d2h_transfer_outputs", lambda: (
        np.asarray(widths), np.asarray(hdr), np.asarray(dense),
        np.asarray(width_sums)))
    widths_np, hdr_np, dense_np, ws_np = outs
    hdr_np = hdr_np.astype(np.uint8)
    zero_flags = ws_np[:nb_max] == 0

    # 4. host plan (native)
    plan = stage("host_build_plan_native",
                 lambda: build_plan(zero_flags, n, ndims, False))

    # 5. host assembly (native)
    stage("host_assemble_native", lambda: encoder.assemble_stream(
        plan, widths_np, hdr_np, dense_np, ndims, 1, False,
        flat[n - plan.remaining_elems:]))

    import os
    if os.environ.get("SPRINTZ_NO_NATIVE"):
        print("(python fallbacks in use)", flush=True)


if __name__ == "__main__":
    main()
