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
