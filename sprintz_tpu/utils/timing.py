"""Reliable device timing: run the kernel in an on-device fori_loop.

Per-call host timing can lie on remote/relayed accelerators (dispatch
latency, unreliable block_until_ready). Looping on device makes
iterations data-dependent (carried scalar), so wall time / iters is the
true steady-state kernel time, dispatch-free.
"""

from __future__ import annotations

import time


def device_loop_time(kernel, args, iters: int = 16) -> float:
    """Seconds per call of ``kernel(*args)`` measured via an on-device loop.

    ``kernel`` must be a traceable function (not pre-jitted) returning an
    array; its first output element is folded into a carried scalar to
    serialize iterations.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*args):
        def body(_, acc):
            out = kernel(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    # warmup/compile
    r = loop(*args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = loop(*args)
    r.block_until_ready()
    # force a host transfer of the scalar: unambiguous completion point
    _ = int(r)
    return (time.perf_counter() - t0) / iters
