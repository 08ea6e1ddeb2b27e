"""Pallas TPU kernel for the chunk-parallel canonical Huffman decode.

The XLA scan formulation (huffman.py:decode_device) re-reads the whole
(W, C) word buffer from HBM on every 2-symbol step for its branchless
refill select — O(steps * W * C) HBM traffic, ~cs/2 times the payload
size. This kernel keeps each lane-tile's words VMEM-resident: the grid
tiles the chunk axis, each program loads its (W, 8, 128) word slab once,
runs the whole bit-cursor loop on the VPU against VMEM, and writes the
(steps, 8, 128) packed canonical indices once. HBM traffic collapses to
payload-read + index-write (~3x payload, vs ~30x for the scan at cs=64).

The decode math is identical to decode_device (huffman.py): bit-reverse
the 12-bit peek, compare against the 11 canonical level limits for the
code length, canonical index = shifted peek + per-length adjustment. The
index -> symbol permutation and per-chunk slicing stay outside in XLA
(fused elementwise bitslice lookup).

Mosaic rules honored (CLAUDE.md): explicit memory_space on every
BlockSpec, no cumsum, no lane-splitting reshapes (3-D blocks), the
symbol loop is statically unrolled (steps is compile-time), and the
tiny length tables ride in SMEM as (1, 16) scalar rows.

Role: the paper pipes Sprintz output through Huff0
(/root/reference/communicate/method.tex:300-303); its in-repo
entropy.cpp:22-44 is an empty-table stub. This kernel is the +Huf
decode stage at TPU speed.
"""

from __future__ import annotations

import functools

import numpy as np

MAX_CODE_LEN = 12
LANE_TILE = 1024  # chunks per grid step: 8 sublanes x 128 lanes


def decode_pallas_available(nchunks_padded: int, chunk_symbols: int) -> bool:
    """The static-unroll kernel wants a lane-tileable chunk count and a
    bounded unroll depth (steps = chunk_symbols / 2)."""
    return (nchunks_padded % LANE_TILE == 0
            and chunk_symbols <= 256 and chunk_symbols % 2 == 0)


def _decode_kernel(limits_ref, adj_ref, words_ref, out_ref, *, steps, nwords):
    import jax
    import jax.numpy as jnp

    def rev12(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 4

    def decode1(lo, hi, nbits):
        v = rev12(lo & 0xFFF).astype(jnp.int32)
        L = jnp.ones_like(nbits)
        for i in range(MAX_CODE_LEN - 1):
            L = L + (v >= limits_ref[0, i]).astype(jnp.int32)
        a = jnp.zeros_like(L)
        for li in range(1, MAX_CODE_LEN + 1):
            a = a + jnp.where(L == li, adj_ref[0, li], 0)
        idx = jax.lax.shift_right_logical(v, MAX_CODE_LEN - L) + a
        idx = jnp.clip(idx, 0, 255)
        Lu = L.astype(jnp.uint32)
        lo = (lo >> Lu) | (hi << (32 - Lu))  # 1 <= L <= 12
        hi = hi >> Lu
        return lo, hi, nbits - L, idx

    shape = (8, 128)
    lo = jnp.zeros(shape, jnp.uint32)
    hi = jnp.zeros(shape, jnp.uint32)
    nbits = jnp.zeros(shape, jnp.int32)
    widx = jnp.zeros(shape, jnp.int32)
    for s in range(steps):
        need = nbits < 24
        w = jnp.zeros(shape, jnp.uint32)
        for wi in range(nwords):  # VMEM-resident select, not a gather
            w = jnp.where(widx == wi, words_ref[wi], w)
        nb_u = nbits.astype(jnp.uint32)
        lo = jnp.where(need, lo | (w << nb_u), lo)
        # (w >> 1) >> (31 - nbits) == w >> (32 - nbits), defined at 0
        hi = jnp.where(need, hi | ((w >> 1) >> (31 - nb_u)), hi)
        nbits = nbits + jnp.where(need, 32, 0)
        widx = widx + need.astype(jnp.int32)
        lo, hi, nbits, i0 = decode1(lo, hi, nbits)
        lo, hi, nbits, i1 = decode1(lo, hi, nbits)
        out_ref[s] = i0 | (i1 << 8)


def decode_device_pallas(words, limits, adj, chunk_symbols: int,
                         interpret: bool | None = None):
    """words (W, C) uint32 (C % 1024 == 0), limits/adj from
    canonical_tables() -> packed canonical indices (steps, C) int32
    (i0 | i1 << 8 per 2-symbol step), matching decode_device's scan
    output before its transpose/bitslice tail.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.pallas_pack import _on_tpu

    W, C = words.shape
    assert C % LANE_TILE == 0
    steps = (chunk_symbols + 1) // 2
    if interpret is None:
        interpret = not _on_tpu()
    lim16 = jnp.zeros((1, 16), jnp.int32).at[0, :11].set(limits[:11])
    adj16 = jnp.zeros((1, 16), jnp.int32).at[0, : adj.shape[0]].set(adj)
    words3 = words.reshape(W, C // 128, 128)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, steps=steps, nwords=W),
        grid=(C // LANE_TILE,),
        in_specs=[
            pl.BlockSpec((1, 16), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((W, 8, 128), lambda t: (0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((steps, 8, 128), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, C // 128, 128), jnp.int32),
        interpret=interpret,
    )(lim16, adj16, words3)
    return out.reshape(steps, C)


def decode_jax_pallas(words, tables, chunk_symbols: int, nchunks: int,
                      n: int, interpret: bool | None = None) -> np.ndarray:
    """Full decode via the Pallas kernel + the XLA bitslice perm tail.
    Inputs as device_decode_prep returns them; output flat uint8."""
    import jax
    import jax.numpy as jnp

    from .huffman import _bitslice_lookup

    limits, adj, perm_tt = (jnp.asarray(x) for x in tables)
    packed = decode_device_pallas(jnp.asarray(words), limits, adj,
                                  chunk_symbols, interpret=interpret)
    steps = packed.shape[0]

    @jax.jit
    def tail(packed, perm_tt):
        p = packed.T  # (C, steps)
        idx = jnp.stack([p & 255, (p >> 8) & 255], -1).reshape(
            p.shape[0], 2 * steps)[:, :chunk_symbols]
        return _bitslice_lookup(idx, perm_tt, 8).astype(jnp.uint8)

    sym = tail(packed, perm_tt)
    return np.asarray(sym[:nchunks]).reshape(-1)[:n]
