"""Reliable device timing: run the kernel in an on-device fori_loop.

Per-call host timing can lie on remote/relayed accelerators (dispatch
latency, per-call transfer costs). Looping on device with the input
perturbed per iteration defeats loop-invariant hoisting, so wall time /
iters is the true steady-state kernel time, dispatch-free. This is the
methodology bench.py uses.
"""

from __future__ import annotations

import time


def device_loop_time(kernel, args, iters: int = 16, vary: int = 0) -> float:
    """Seconds per call of ``kernel(*args)`` measured via an on-device loop.

    ``kernel`` must be a traceable function (not pre-jitted). The argument
    at index ``vary`` rides the loop carry with a single-element
    perturbation per iteration so the kernel cannot be hoisted out of the
    loop.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*a):
        def body(i, st):
            arr, acc = st
            flat = arr.reshape(-1)
            arr = flat.at[0].set(flat[0] ^ (i & 1)).reshape(arr.shape)
            aa = list(a)
            aa[vary] = arr
            out = kernel(*aa)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return arr, acc + leaf.reshape(-1)[0].astype(jnp.int32)

        _, acc = jax.lax.fori_loop(0, iters, body, (a[vary], jnp.int32(0)))
        return acc

    r = loop(*args)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = loop(*args)
    r.block_until_ready()
    # force a host transfer of the scalar: unambiguous completion point
    _ = int(r)
    return (time.perf_counter() - t0) / iters
