"""Pallas TPU kernel for the chunk-parallel canonical Huffman decode.

The XLA scan formulation (huffman.py:decode_device) re-reads the whole
(W, C) word buffer from HBM on every 2-symbol step for its branchless
refill select — O(steps * W * C) HBM traffic, ~cs/2 times the payload
size. This kernel keeps each lane-tile's words VMEM-resident: the grid
tiles the chunk axis, each program loads its (W, 8, 128) word slab once,
runs the whole bit-cursor loop on the VPU against VMEM, and writes the
(steps, 8, 128) packed canonical indices once. HBM traffic collapses to
payload-read + index-write (~3x payload, vs ~30x for the scan at cs=64).

Two round-4 optimizations (VERDICT r3 item 3):

- **Windowed refill**: the refill word-select chain was the kernel's
  dominant VPU cost (W wheres per step, W ~ 56 at cs=128). But a lane's
  word cursor obeys 32*widx = nbits + consumed with 2 <= consumed/step
  <= 24 (1- vs 12-bit codes, two per step) and nbits < 24 at refill, so
  at step s only words in [ceil((2s-23)/32), (23+24s)/32] are reachable.
  Interval propagation of (nbits, widx) bounds (see _refill_windows)
  prunes the statically-unrolled chain 2.4x, and steps whose nbits
  lower bound proves >= 24 skip the refill entirely.
- **Fused permutation (opt-in)**: ``perm_b`` runs the canonical-index ->
  symbol byte-LUT lookup in-kernel on the VMEM-resident pairs, so the
  XLA tail is a pure transpose + byte split (no 60-op lookup pass over
  HBM). A/B'd against the split pipeline on device; whichever wins is
  the FUSE_PERM default.

The decode math is identical to decode_device (huffman.py): bit-reverse
the 12-bit peek, compare against the 11 canonical level limits for the
code length, canonical index = shifted peek + per-length adjustment.

Mosaic rules honored (CLAUDE.md): explicit memory_space on every
BlockSpec, no cumsum, no lane-splitting reshapes (3-D blocks), the
symbol loop is statically unrolled (steps is compile-time), and the
tiny tables ride in SMEM as (1, k) scalar rows.

Role: the paper pipes Sprintz output through Huff0
(/root/reference/communicate/method.tex:300-303); its in-repo
entropy.cpp:22-44 is an empty-table stub. This kernel is the +Huf
decode stage at TPU speed.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import config

MAX_CODE_LEN = 12
LANE_TILE = 1024  # chunks per grid step: 8 sublanes x 128 lanes

# Run the canonical-index -> symbol permutation inside the kernel
# (default decided by the round-4 device A/B; see module docstring).
FUSE_PERM = config.get("SPRINTZ_HUFF_FUSE_PERM", default="1") == "1"


def decode_pallas_available(nchunks_padded: int, chunk_symbols: int) -> bool:
    """The static-unroll kernel wants a lane-tileable chunk count and a
    bounded unroll depth (steps = chunk_symbols / 2)."""
    return (nchunks_padded % LANE_TILE == 0
            and chunk_symbols <= 256 and chunk_symbols % 2 == 0)


def _refill_windows(steps: int, nwords: int):
    """Per-step (lo, hi) word-index windows reachable at refill time,
    or None when no lane can need a refill (nbits provably >= 24).

    Sound interval propagation: nbits/widx bounds advance exactly as the
    kernel does (refill adds 32 bits and one word when nbits < 24; each
    step then decodes two codes of 1..12 bits), intersected with the
    bit-conservation bounds 32*widx = nbits + consumed, 2s <= consumed
    <= 24s, nbits < 24 for refilling lanes at step s.
    """
    n_lo = n_hi = 0
    w_lo = w_hi = 0
    out = []
    for s in range(steps):
        may = n_lo < 24
        must = n_hi < 24
        if may:
            alo = max(0, -(-(2 * s - 23) // 32))
            ahi = (23 + 24 * s) // 32
            lo = max(w_lo, alo)
            hi = min(w_hi, ahi, nwords - 1)
            # Invariant the kernel relies on (ADVICE r4): a window
            # clipped empty must be empty BECAUSE of the nwords-1 cap —
            # i.e. every lane that may still need a refill has widx past
            # the last real word, so skipping its masked nbits/widx
            # updates only perturbs provable tail junk. The uncapped
            # window (interval bounds alone) is never empty while
            # may-refill lanes exist.
            assert hi >= lo or min(w_hi, ahi) >= lo > nwords - 1, (
                f"refill window empty without the nwords cap at step {s}")
            out.append((lo, hi))
            new_lo = n_lo + 32 if must else min(n_lo + 32, 24)
            new_hi = max(min(n_hi, 23) + 32, 0 if must else n_hi)
            n_lo, n_hi = new_lo, new_hi
            w_hi += 1
            if must:
                w_lo += 1
        else:
            out.append(None)
        n_lo, n_hi = max(n_lo - 24, 0), n_hi - 2
    return out


def _decode_kernel(limits_ref, adj_ref, words_ref, out_ref, *, steps,
                   nwords, perm_ref=None):
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
        if perm_ref is not None:
            # in-kernel byte-LUT permutation (huffman._byte_lookup's
            # flat select against the SMEM-resident packed perm)
            w = jnp.full(idx.shape, perm_ref[0, 0], jnp.uint32)
            for j in range(1, 64):
                w = jnp.where((idx >> 2) == j, perm_ref[0, j], w)
            idx = ((w >> ((idx & 3) * 8).astype(jnp.uint32)) & 255
                   ).astype(jnp.int32)
        Lu = L.astype(jnp.uint32)
        lo = (lo >> Lu) | (hi << (32 - Lu))  # 1 <= L <= 12
        hi = hi >> Lu
        return lo, hi, nbits - L, idx

    windows = _refill_windows(steps, nwords)
    shape = (8, 128)
    lo = jnp.zeros(shape, jnp.uint32)
    hi = jnp.zeros(shape, jnp.uint32)
    nbits = jnp.zeros(shape, jnp.int32)
    widx = jnp.zeros(shape, jnp.int32)
    for s in range(steps):
        win = windows[s]
        # A window clipped empty by the nwords-1 cap (win[1] < win[0])
        # skips the WHOLE refill block, including the need-masked
        # nbits/widx updates — sound only because an empty clipped
        # window implies every refill-needing lane has already consumed
        # the full chunk payload (widx bounds reach past the last real
        # word), so those lanes decode tail junk the callers slice off.
        # _refill_windows asserts this invariant (ADVICE r4).
        if win is not None and win[1] >= win[0]:
            need = nbits < 24
            w = jnp.zeros(shape, jnp.uint32)
            for wi in range(win[0], win[1] + 1):  # windowed VMEM select
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
                         interpret: bool | None = None, perm_b=None):
    """words (W, C) uint32 (C % 1024 == 0), limits/adj from
    canonical_tables() -> packed canonical indices (steps, C) int32
    (i0 | i1 << 8 per 2-symbol step), matching decode_device's scan
    output before its transpose/lookup tail. With ``perm_b``
    (pack_byte_lut(perm)) the permutation runs in-kernel and the packed
    pairs hold SYMBOLS (sym0 | sym1 << 8).
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
    specs = [
        pl.BlockSpec((1, 16), lambda t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 16), lambda t: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((W, 8, 128), lambda t: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [lim16, adj16, words3]
    if perm_b is not None:
        specs.append(pl.BlockSpec((1, 64), lambda t: (0, 0),
                                  memory_space=pltpu.SMEM))
        args.append(jnp.asarray(perm_b, jnp.uint32).reshape(1, 64))

        def kernel(limits_ref, adj_ref, words_ref, perm_ref, out_ref):
            _decode_kernel(limits_ref, adj_ref, words_ref, out_ref,
                           steps=steps, nwords=W, perm_ref=perm_ref)
    else:
        kernel = functools.partial(_decode_kernel, steps=steps, nwords=W)
    out = pl.pallas_call(
        kernel,
        grid=(C // LANE_TILE,),
        in_specs=specs,
        out_specs=pl.BlockSpec((steps, 8, 128), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, C // 128, 128), jnp.int32),
        interpret=interpret,
    )(*args)
    return out.reshape(steps, C)


def decode_jax_pallas(words, tables, chunk_symbols: int, nchunks: int,
                      n: int, interpret: bool | None = None,
                      fuse_perm: bool | None = None) -> np.ndarray:
    """Full decode via the Pallas kernel + the XLA tail. Inputs as
    device_decode_prep returns them; output flat uint8. The tail is a
    transpose + byte split, plus the byte-LUT permutation when it is
    not fused into the kernel (FUSE_PERM)."""
    import jax
    import jax.numpy as jnp

    from .huffman import _byte_lookup

    if fuse_perm is None:
        fuse_perm = FUSE_PERM
    limits, adj, perm_b = (jnp.asarray(x) for x in tables)
    packed = decode_device_pallas(
        jnp.asarray(words), limits, adj, chunk_symbols,
        interpret=interpret, perm_b=perm_b if fuse_perm else None)
    steps = packed.shape[0]

    @jax.jit
    def tail(packed, perm_b):
        p = packed.T  # (C, steps)
        idx = jnp.stack([p & 255, (p >> 8) & 255], -1).reshape(
            p.shape[0], 2 * steps)[:, :chunk_symbols]
        if fuse_perm:
            return idx.astype(jnp.uint8)
        return _byte_lookup(idx, perm_b).astype(jnp.uint8)

    sym = tail(packed, perm_b)
    return np.asarray(sym[:nchunks]).reshape(-1)[:n]
