"""Fused Pallas decode pipeline: payload bytes -> reconstructed values.

Replaces the XLA matmul unpack (ops/pack.py) + hierarchical cumsum
(models/forecasters.py) for the contiguous (run-free) delta decode path.
The XLA pipeline materializes per-block unpack weights and f32 prefix
intermediates in HBM (~130 MB of traffic for an 8 MiB stream); these two
kernels keep everything per-tile in VMEM:

- K1 ``unpack_zz``: select-accumulate field extraction (the TPU's
  pext — sprintz_delta_rle.cpp:693-712 uses _pdep_u64) fused with the
  zigzag decode, emitting *narrow* u8/u16 deltas biased to unsigned,
  plus each grid tile's per-dim delta total for the cross-tile prefix.
- K2 ``prefix_finish``: intra-tile inclusive prefix as an in-kernel MXU
  lower-triangular matmul over biased byte planes (integers < 256 are
  bf16-exact; partial sums < 2^17 are f32-exact — same argument as
  hierarchical_cumsum), plus the exclusive cross-tile offset, mask, and
  narrow — one pass, u8/u16 in and out.

Between them runs only a tiny XLA exclusive scan over (ntiles, D) tile
totals. Total HBM traffic: payload + 2 reads + 2 writes of the narrow
error/value arrays.

Mosaic rules honored (CLAUDE.md): explicit VMEM memory_space everywhere,
no in-kernel cumsum (the prefix is a matmul), no lane-splitting reshapes
(3-D BlockSpecs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLOCK_SZ


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _pick_tile(nb: int, want: int) -> int:
    for t in (want, 256, 128, 64, 32, 16, 8):
        if t <= want and nb % t == 0:
            return t
    return 1


# ------------------------------------------------------------------ K1


def _unpack_zz_kernel(dense_ref, widths_ref, off_ref, out_ref, tot_ref,
                      *, maxb, ndims, elem_bits):
    """Field extraction + zigzag decode + bias, per (T blocks) tile.

    out: biased deltas (delta + 2^(eb-1)) as u8 (eb=8) / u16 (eb=16) —
    unsigned-narrow so K2 can rebuild byte planes without sign handling.
    tot: per-tile per-dim i32 sum of the true (signed) deltas.
    """
    w = widths_ref[:]  # (T, D) i32
    off = off_ref[:]
    q = off >> 3
    dense = dense_ref[:].astype(jnp.int32)  # u8 tile -> i32 lanes in VMEM
    t = w.shape[0]
    acc = jnp.zeros((t, BLOCK_SZ, ndims), jnp.int32)
    for j in range(maxb):
        rel = j - q  # (T, D)
        sel = (rel >= 0) & (rel < 3)
        sh = jnp.clip(rel, 0, 2) << 3
        byte_j = dense[:, :, j]  # (T, 8) static lane index
        acc = acc + jnp.where(sel[:, None, :],
                              byte_j[:, :, None] << sh[:, None, :], 0)
    word = acc >> (off & 7)[:, None, :]
    u = word & ((1 << w)[:, None, :] - 1)  # zigzag values, eb bits
    # fused zigzag decode; bias into [0, 2^eb)
    delta = (u >> 1) ^ -(u & 1)  # signed, in [-2^(eb-1), 2^(eb-1))
    bias = 1 << (elem_bits - 1)
    out_ref[:] = (delta + bias).astype(
        jnp.uint8 if elem_bits == 8 else jnp.uint16)
    tot_ref[0, 0, :] = jnp.sum(delta, axis=(0, 1), dtype=jnp.int32)


def unpack_zz(dense: jnp.ndarray, widths: jnp.ndarray, elem_bits: int,
              tile: int = 128, interpret: bool | None = None):
    """dense (nb, 8, MAXB) uint8, widths (nb, D) i32 ->
    (biased deltas (nb, 8, D) narrow, tile totals (ntiles, D) i32)."""
    nb, _, maxb = dense.shape
    ndims = widths.shape[1]
    t = _pick_tile(nb, tile)
    if interpret is None:
        interpret = not _on_tpu()
    off = jnp.cumsum(widths, axis=1) - widths
    odt = jnp.uint8 if elem_bits == 8 else jnp.uint16
    return pl.pallas_call(
        functools.partial(_unpack_zz_kernel, maxb=maxb, ndims=ndims,
                          elem_bits=elem_bits),
        grid=(nb // t,),
        in_specs=[
            pl.BlockSpec((t, BLOCK_SZ, maxb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, BLOCK_SZ, ndims), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (ntiles, 1, D): last-two block dims equal the array dims,
            # satisfying Mosaic's tiling rule for the tiny totals output
            pl.BlockSpec((1, 1, ndims), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, BLOCK_SZ, ndims), odt),
            jax.ShapeDtypeStruct((nb // t, 1, ndims), jnp.int32),
        ),
        interpret=interpret,
    )(dense, widths, off)


# ------------------------------------------------------------------ K2


def _prefix_finish_kernel(bz_ref, tileoff_ref, tri_ref, out_ref,
                          *, elem_bits, rows_tile, ndims):
    """Intra-tile inclusive prefix (MXU tri-matmul over byte planes) +
    cross-tile offset + wraparound mask, narrow in/out."""
    bz = bz_ref[:].astype(jnp.int32)  # (R, D) biased deltas
    tri = tri_ref[:]  # (R, R) bf16 lower-triangular ones
    bias = 1 << (elem_bits - 1)
    counts = jax.lax.broadcasted_iota(
        jnp.int32, (rows_tile, ndims), 0) + 1  # rows summed so far
    if elem_bits == 8:
        # single plane: biased delta already in [0, 256)
        p = bz.astype(jnp.bfloat16)
        inner = jax.lax.dot_general(
            tri, p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        prefix = inner - counts * bias
    else:
        lo = (bz & 0xFF).astype(jnp.bfloat16)
        hi = (bz >> 8).astype(jnp.bfloat16)  # in [0, 256)
        planes = jnp.concatenate([lo, hi], axis=1)  # (R, 2D)
        inner = jax.lax.dot_general(
            tri, planes, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        prefix = (inner[:, :ndims] + (inner[:, ndims:] << 8)
                  - counts * bias)
    vals = (prefix + tileoff_ref[0, 0, :][None, :]) & ((1 << elem_bits) - 1)
    out_ref[:] = vals.astype(jnp.uint8 if elem_bits == 8 else jnp.uint16)


def prefix_finish(bz: jnp.ndarray, tile_offsets: jnp.ndarray,
                  elem_bits: int, rows_tile: int,
                  interpret: bool | None = None) -> jnp.ndarray:
    """bz (rows, D) biased narrow deltas; tile_offsets (ntiles, 1, D) i32
    exclusive prefix entering each rows_tile-row tile -> values (rows, D)
    narrow."""
    rows, ndims = bz.shape
    assert rows % rows_tile == 0
    if interpret is None:
        interpret = not _on_tpu()
    tri = jnp.tril(jnp.ones((rows_tile, rows_tile), jnp.bfloat16))
    odt = jnp.uint8 if elem_bits == 8 else jnp.uint16
    return pl.pallas_call(
        functools.partial(_prefix_finish_kernel, elem_bits=elem_bits,
                          rows_tile=rows_tile, ndims=ndims),
        grid=(rows // rows_tile,),
        in_specs=[
            pl.BlockSpec((rows_tile, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ndims), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, rows_tile), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_tile, ndims), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, ndims), odt),
        interpret=interpret,
    )(bz, tile_offsets, tri)


# ------------------------------------------------------------ pipeline


def decode_delta_contiguous(dense: jnp.ndarray, widths: jnp.ndarray,
                            elem_bits: int, block_tile: int = 32,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Full fused run-free delta decode: payload -> values (nb*8, D).

    dense (nb, 8, MAXB) uint8; widths (nb, D) int32. ``block_tile``
    trades MXU prefix work (linear in tile rows) against grid overhead.
    """
    nb, _, _ = dense.shape
    ndims = widths.shape[1]
    t = _pick_tile(nb, block_tile)
    bz, tots = unpack_zz(dense, widths, elem_bits, tile=t,
                         interpret=interpret)
    # tiny cross-tile exclusive prefix in XLA: (ntiles, 1, D) i32
    tile_offsets = jnp.cumsum(tots, axis=0, dtype=jnp.int32) - tots
    rows_tile = t * BLOCK_SZ
    return prefix_finish(bz.reshape(nb * BLOCK_SZ, ndims), tile_offsets,
                         elem_bits, rows_tile, interpret=interpret)
