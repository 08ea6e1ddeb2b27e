"""Pallas TPU kernels for bit-pack/unpack: fused, VMEM-resident.

The XLA matmul formulation (ops/pack.py) materializes per-block one-hot /
weight tensors in HBM (O(nb * D * MAXB) traffic). These kernels keep the
whole computation in VMEM per block-tile: the select-accumulate over the
static byte axis runs on the VPU with no intermediate HBM round trips and
no gathers.

Mosaic notes (learned the hard way on v5e):
- every BlockSpec needs an explicit ``memory_space=pltpu.VMEM`` (the
  default crashes the compiler),
- no ``cumsum`` lowering -> width prefixes are computed outside,
- no lane-splitting reshapes inside the kernel -> blocks are 3-D
  (tile, 8 rows, bytes) so refs already have their final shapes.

Used automatically on TPU; interpret mode keeps them testable on CPU.
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


def _tile(nb: int) -> int:
    for t in (256, 128, 64, 32, 16, 8):
        if nb % t == 0:
            return t
    return 1


def _unpack_kernel(dense_ref, widths_ref, off_ref, out_ref, *, maxb, ndims):
    w = widths_ref[:]  # (T, D)
    off = off_ref[:]  # precomputed exclusive prefix (no Mosaic cumsum)
    q = off >> 3  # (T, D)
    dense = dense_ref[:]  # (T, 8, MAXB)
    t = w.shape[0]
    acc = jnp.zeros((t, BLOCK_SZ, ndims), jnp.int32)
    for j in range(maxb):
        rel = j - q  # (T, D)
        sel = (rel >= 0) & (rel < 3)
        sh = jnp.clip(rel, 0, 2) << 3
        byte_j = dense[:, :, j]  # (T, 8), static index
        acc = acc + jnp.where(sel[:, None, :],
                              byte_j[:, :, None] << sh[:, None, :], 0)
    word = acc >> (off & 7)[:, None, :]
    out_ref[:] = word & ((1 << w)[:, None, :] - 1)


def unpack_rows_pallas(dense: jnp.ndarray, widths: jnp.ndarray,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Pallas version of ops.pack.unpack_rows_rowmajor.

    dense: (nb, 8, MAXB) int32; widths: (nb, D) int32 -> (nb, 8, D) int32.
    """
    nb, _, maxb = dense.shape
    ndims = widths.shape[1]
    t = _tile(nb)
    if interpret is None:
        interpret = not _on_tpu()
    off = jnp.cumsum(widths, axis=1) - widths
    return pl.pallas_call(
        functools.partial(_unpack_kernel, maxb=maxb, ndims=ndims),
        grid=(nb // t,),
        in_specs=[
            pl.BlockSpec((t, BLOCK_SZ, maxb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, BLOCK_SZ, ndims), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, BLOCK_SZ, ndims), jnp.int32),
        interpret=interpret,
    )(dense, widths, off)


def _unpack_mxu_kernel(dense_ref, ow_ref, out_ref, *, tb, maxb, ndims):
    out_dtype = out_ref.dtype
    """One tile: TB blocks unpacked by a single block-diagonal MXU dot.

    The production XLA path streams a (nb, MAXB, D) bf16 weight tensor
    through HBM (~16x the payload bytes — the dominant term of the
    headline decode's traffic, docs/STATUS.md). Here the weight AND the
    block-diagonal payload live only in VMEM, built per tile:

      A (TB*8, TB*MAXB) = block-diagonal payload bytes (block c's rows
          occupy lane window [c*MAXB, (c+1)*MAXB))
      W (TB*MAXB, D)    = stacked per-block one-hot byte-window weights
      word = A @ W      - one dot, contraction dim TB*MAXB = 512

    so HBM traffic collapses to payload + offsets + output. The
    block-diagonal zeros waste TB x MACs, but the MXU has ~100x headroom
    over HBM here. Same exact-bf16 arithmetic as ops/pack.py (bytes and
    power-of-two weights exact in bf16, every sum < 2^24 exact in f32).

    dense_ref: (1, TB*8, MAXB) uint8; ow_ref: (1, TB, D) int32 packed
    bit-offset | width << 12; out_ref: (1, TB*8, D) int32.
    """
    ow = ow_ref[0]  # (TB, D)
    off = ow & 4095
    wid = ow >> 12
    q = off >> 3  # (TB, D) first-byte index, < MAXB

    def to_bf16(x):
        # Mosaic on this stack has no uint8 -> bfloat16 cast (session 28);
        # int8 is bitcast payload bytes (go via i32, mask the sign-extend)
        if x.dtype == jnp.int8:
            return (x.astype(jnp.int32) & 255).astype(jnp.bfloat16)
        if x.dtype != jnp.bfloat16:
            return x.astype(jnp.bfloat16)
        return x
    # W: (TB, MAXB, D) -> leading-axis merge to (TB*MAXB, D). The only
    # reshapes in this kernel merge LEADING axes (minor dim untouched —
    # lane-splitting reshapes don't lower, CLAUDE.md).
    j3 = jax.lax.broadcasted_iota(jnp.int32, (tb, maxb, ndims), 1)
    rel = j3 - q[:, None, :]
    w3 = jnp.where(rel == 0, 1.0,
                   jnp.where(rel == 1, 256.0,
                             jnp.where(rel == 2, 65536.0, 0.0)))
    w2 = w3.astype(jnp.bfloat16).reshape(tb * maxb, ndims)
    dense = to_bf16(dense_ref[0])  # (TB*8, MAXB)
    # block-diagonal A from TB static sublane slices padded to their lane
    # window (concat of zeros | slice | zeros; no iota/compare mask)
    zero8 = jnp.zeros((BLOCK_SZ, maxb), jnp.bfloat16)
    pieces = []
    for c in range(tb):
        db_c = dense[c * BLOCK_SZ:(c + 1) * BLOCK_SZ]  # (8, MAXB) static
        row = ([zero8] * c) + [db_c] + ([zero8] * (tb - 1 - c))
        pieces.append(jnp.concatenate(row, axis=1))  # (8, TB*MAXB)
    a2 = jnp.concatenate(pieces, axis=0)  # (TB*8, TB*MAXB)
    word = jnp.dot(a2, w2, preferred_element_type=jnp.float32)
    wi = word.astype(jnp.int32)  # (TB*8, D)
    sh = jnp.broadcast_to((off & 7)[:, None, :],
                          (tb, BLOCK_SZ, ndims)).reshape(tb * BLOCK_SZ, ndims)
    mk = jnp.broadcast_to(((1 << wid) - 1)[:, None, :],
                          (tb, BLOCK_SZ, ndims)).reshape(tb * BLOCK_SZ, ndims)
    res = (wi >> sh) & mk
    # bf16 output halves the kernel's dominant HBM term; exact only for
    # u8 fields (values <= 255) — callers gate on elem_sz
    out_ref[0] = res if out_dtype == jnp.int32 else res.astype(out_dtype)


def unpack_rows_pallas_mxu(dense: jnp.ndarray, widths: jnp.ndarray,
                           tb: int = 16, interpret: bool | None = None,
                           in_dtype: str = "i8", out_dtype: str = "i32"
                           ) -> jnp.ndarray:
    """Block-diagonal-MXU Pallas version of ops.pack.unpack_rows_rowmajor
    (VERDICT r2 item 5 angle b — the in-VMEM one-hot attempt).

    dense: (nb, 8, MAXB) int32/uint8; widths: (nb, D) int32.
    Returns errs (nb, 8, D) int32. nb must be a multiple of tb.
    in_dtype: payload carrier into the kernel — "i8" (bytes bitcast to
    int8, 1x payload HBM; Mosaic lacks a u8->bf16 cast), "bf16"
    (host-side convert, 2x payload HBM but no in-kernel cast), "u8"
    (needs a Mosaic with the direct cast).
    """
    nb, _, maxb = dense.shape
    ndims = widths.shape[1]
    odt = jnp.bfloat16 if out_dtype == "bf16" else jnp.int32
    if interpret is None:
        interpret = not _on_tpu()
    while tb > 1 and nb % tb:
        tb //= 2
    widths = widths.astype(jnp.int32)  # u8 widths overflow the cumsum
    off = jnp.cumsum(widths, axis=1) - widths  # outside: no Mosaic cumsum
    ow = (off | (widths << 12)).astype(jnp.int32)
    ntiles = nb // tb
    carrier = {"i8": jnp.int8, "u8": jnp.uint8, "bf16": jnp.bfloat16}
    if in_dtype == "i8":
        dense3 = jax.lax.bitcast_convert_type(
            dense.astype(jnp.uint8), jnp.int8)
    else:
        dense3 = dense.astype(carrier[in_dtype])
    dense3 = dense3.reshape(ntiles, tb * BLOCK_SZ, maxb)
    ow3 = ow.reshape(ntiles, tb, ndims)
    out = pl.pallas_call(
        functools.partial(_unpack_mxu_kernel, tb=tb, maxb=maxb,
                          ndims=ndims),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, tb * BLOCK_SZ, maxb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, ndims), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb * BLOCK_SZ, ndims),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, tb * BLOCK_SZ, ndims),
                                       odt),
        interpret=interpret,
    )(dense3, ow3)
    return out.reshape(nb, BLOCK_SZ, ndims)


def _pack_kernel(errs_ref, widths_ref, off_ref, out_ref, *, maxb, ndims):
    off = off_ref[:]
    q = off >> 3
    t = off.shape[0]
    errs = errs_ref[:]  # (T, 8, D)
    c = errs << (off & 7)[:, None, :]  # up to 23 bits
    outs = []
    for j in range(maxb):
        total = jnp.zeros((t, BLOCK_SZ), jnp.int32)
        for k in range(3):
            sel = (q == j - k)  # (T, D)
            byte_k = (c >> (8 * k)) & 0xFF
            total = total + jnp.where(sel[:, None, :], byte_k, 0).sum(axis=2)
        outs.append(total)
    out_ref[:] = jnp.stack(outs, axis=-1)  # (T, 8, MAXB)


def pack_rows_pallas(errs_zz: jnp.ndarray, widths: jnp.ndarray,
                     elem_sz: int, interpret: bool | None = None
                     ) -> jnp.ndarray:
    """Pallas version of ops.pack.pack_rows_rowmajor.

    errs_zz: (nb, 8, D) int32; widths: (nb, D) -> dense (nb, 8, MAXB) uint8.
    """
    nb, _, ndims = errs_zz.shape
    maxb = ndims * elem_sz
    t = _tile(nb)
    if interpret is None:
        interpret = not _on_tpu()
    off = jnp.cumsum(widths, axis=1) - widths
    out = pl.pallas_call(
        functools.partial(_pack_kernel, maxb=maxb, ndims=ndims),
        grid=(nb // t,),
        in_specs=[
            pl.BlockSpec((t, BLOCK_SZ, ndims), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, ndims), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, BLOCK_SZ, maxb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, BLOCK_SZ, maxb), jnp.int32),
        interpret=interpret,
    )(errs_zz, widths, off)
    return out.astype(jnp.uint8)
