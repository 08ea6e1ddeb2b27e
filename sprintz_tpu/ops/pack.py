"""JAX bit-packing kernels: per-block payload bytes from errors + widths.

The reference packs with per-stripe ``_pext_u64`` loops
(sprintz_delta_rle.cpp:345-381). TPUs have no bit scatter/gather, so the
pack is reformulated as a batched one-hot matmul: each value contributes
up to 3 bytes (w <= 16 bits shifted by <= 7), scattered onto output byte
positions via an exact f32 matmul that XLA tiles onto the MXU. Bits of
different values never collide within a byte, so the matmul's adds are
equivalent to the reference's ORs.

Outputs are dense per-block buffers; variable-length stream assembly is
a host/gather concern (see planner.py / encoder.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import BLOCK_SZ


def _scatter_bytes(contrib: jnp.ndarray, byte_idx: jnp.ndarray, maxb: int
                   ) -> jnp.ndarray:
    """Sum byte contributions onto byte positions.

    contrib: (..., K) int32 byte values (0..255)
    byte_idx: (..., K) int32 target byte positions (out of range -> dropped)
    Returns (..., maxb) int32.
    """
    onehot = (byte_idx[..., None] == jnp.arange(maxb)[None, :]).astype(
        jnp.float32)
    dense = jnp.einsum("...k,...km->...m", contrib.astype(jnp.float32), onehot,
                       preferred_element_type=jnp.float32)
    return dense.astype(jnp.int32)


def pack_rows_rowmajor(errs_zz: jnp.ndarray, widths: jnp.ndarray,
                       elem_sz: int) -> jnp.ndarray:
    """Pack row-major block payloads.

    errs_zz: (nb, 8, D) int32 zigzag errors; widths: (nb, D) int32.
    Returns dense (nb, 8, MAXB) uint8 where MAXB = D * elem_sz; row r of
    block b occupies its first ceil(sum(widths[b])/8) bytes.
    """
    nb, _, ndims = errs_zz.shape
    maxb = ndims * elem_sz
    off = jnp.cumsum(widths, axis=1) - widths  # exclusive prefix (nb, D)
    shift = (off & 7)[:, None, :]  # (nb, 1, D)
    c = errs_zz << shift  # up to 23 bits
    # 3 byte lanes per value
    contrib = jnp.stack([(c >> (8 * k)) & 0xFF for k in range(3)], axis=-1)
    byte_idx = (off >> 3)[:, None, :, None] + jnp.arange(3)[None, None, None, :]
    byte_idx = jnp.broadcast_to(byte_idx, contrib.shape)
    dense = _scatter_bytes(
        contrib.reshape(nb, BLOCK_SZ, ndims * 3),
        byte_idx.reshape(nb, BLOCK_SZ, ndims * 3),
        maxb,
    )
    return dense.astype(jnp.uint8)


def pack_dims_lowdim(errs_zz: jnp.ndarray, widths: jnp.ndarray,
                     elem_sz: int) -> jnp.ndarray:
    """Pack lowdim (column-major) block payloads.

    Each dim's 8 samples pack into exactly widths[b, d] bytes.
    Returns dense (nb, D, EB) uint8, EB = 8 * elem_sz.
    """
    nb, _, ndims = errs_zz.shape
    eb = 8 * elem_sz
    bitoff = jnp.arange(BLOCK_SZ)[None, :, None] * widths[:, None, :]  # (nb,8,D)
    c = errs_zz << (bitoff & 7)
    contrib = jnp.stack([(c >> (8 * k)) & 0xFF for k in range(3)], axis=-1)
    byte_idx = (bitoff >> 3)[..., None] + jnp.arange(3)[None, None, None, :]
    # scatter over (sample, bytelane) per (block, dim)
    contrib = contrib.transpose(0, 2, 1, 3).reshape(nb, ndims, BLOCK_SZ * 3)
    byte_idx = byte_idx.transpose(0, 2, 1, 3).reshape(nb, ndims, BLOCK_SZ * 3)
    dense = _scatter_bytes(contrib, byte_idx, eb)
    return dense.astype(jnp.uint8)


def unpack_rows_rowmajor(dense: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    """Extract per-dim fields from packed rows.

    dense: (nb, 8, MAXB) int32 bytes (payload rows, zero padded);
    widths: (nb, D) int32. Returns errs_zz (nb, 8, D) int32.
    """
    nb, ndims = widths.shape
    maxb = dense.shape[-1]
    off = jnp.cumsum(widths, axis=1) - widths
    byte_idx = (off >> 3)[:, None, :, None] + jnp.arange(3)[None, None, None, :]
    byte_idx = jnp.clip(byte_idx, 0, maxb - 1)  # (nb, 1, D, 3)
    byte_idx = jnp.broadcast_to(byte_idx, (nb, BLOCK_SZ, ndims, 3))
    gathered = jnp.take_along_axis(dense[:, :, None, :], byte_idx, axis=3)
    word = (gathered[..., 0] | (gathered[..., 1] << 8)
            | (gathered[..., 2] << 16))
    word = word >> (off & 7)[:, None, :]
    mask = (1 << widths)[:, None, :] - 1
    return word & mask


def unpack_dims_lowdim(dense: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_dims_lowdim.

    dense: (nb, D, EB) int32 bytes; widths: (nb, D) int32.
    Returns errs_zz (nb, 8, D) int32.
    """
    nb, ndims, eb = dense.shape
    bitoff = jnp.arange(BLOCK_SZ)[None, :, None] * widths[:, None, :]  # (nb,8,D)
    byte_idx = (bitoff >> 3)[..., None] + jnp.arange(3)[None, None, None, :]
    byte_idx = jnp.clip(byte_idx, 0, eb - 1)  # (nb, 8, D, 3)
    gathered = jnp.take_along_axis(dense[:, None, :, :], byte_idx, axis=3)
    word = (gathered[..., 0] | (gathered[..., 1] << 8)
            | (gathered[..., 2] << 16))
    word = word >> (bitoff & 7)
    mask = (1 << widths)[:, None, :] - 1
    return word & mask
