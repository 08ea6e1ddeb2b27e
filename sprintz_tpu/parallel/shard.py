"""Data-parallel multi-chip encode/decode over a jax.sharding.Mesh.

The reference is strictly single-threaded (SURVEY §2.10); this layer is the
TPU-native scaling design mandated by the north star:

- **dp axis**: independent chunks of a stream (or independent streams) are
  sharded one-per-chip with ``shard_map``. Chunk boundaries carry the
  forecaster boundary state: for delta, each chunk's first row differences
  against the previous chunk's last row (obtained with ``ppermute``), so
  the *concatenated* decode is bit-identical to a single-stream decode.
- **offset scan**: per-shard compressed sizes are shared with
  ``all_gather``; an exclusive prefix sum gives each shard's byte offset
  in the final stream (deterministic stream layout without serialization).
- **decode prefix fixup**: each shard cumsums its local deltas, then adds
  the exclusive cross-shard prefix of per-shard row sums — a distributed
  prefix-sum over ICI, the codec analogue of sequence parallelism
  (SURVEY §5).

All collectives ride XLA (psum/all_gather/ppermute) inside ``shard_map``;
on a multi-chip mesh they lower to ICI transfers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import BLOCK_SZ
from ..models.forecasters import fire_encode
from ..ops.bitmath import block_widths_rowmajor, header_value, sign_extend, zigzag_decode, zigzag_encode
from ..ops.pack import pack_rows_rowmajor, unpack_rows_rowmajor


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# --------------------------------------------------------------- encode


def _shard_encode(rows: jnp.ndarray, elem_sz: int, codec: str):
    """Per-shard block encode. rows: (local_rows, D) int32."""
    eb = 8 * elem_sz
    if codec == "delta":
        # differencing against the previous chunk's last row keeps the
        # concatenated stream identical to single-chip encode
        prev_last = jax.lax.ppermute(
            rows[-1], "dp",
            [(i, (i + 1) % jax.lax.axis_size("dp"))
             for i in range(jax.lax.axis_size("dp"))])
        first_prev = jnp.where(jax.lax.axis_index("dp") == 0,
                               jnp.zeros_like(prev_last), prev_last)
        prev = jnp.concatenate([first_prev[None, :], rows[:-1]], axis=0)
        errs = zigzag_encode(sign_extend(rows - prev, eb), eb)
    else:
        # FIRE state is a sequential recurrence; dp shards are independent
        # streams (boundary handoff handled at a higher level)
        errs = fire_encode(rows, eb)
    nb = rows.shape[0] // BLOCK_SZ
    blocks = errs.reshape(nb, BLOCK_SZ, -1)
    ormask = jnp.bitwise_or.reduce(blocks, axis=1)
    widths = block_widths_rowmajor(ormask, elem_sz)
    dense = pack_rows_rowmajor(blocks, widths, elem_sz)
    hdr = header_value(widths, eb)
    # per-shard payload byte count and cross-shard exclusive offset scan
    nbytes = (BLOCK_SZ * ((widths.sum(axis=1) + 7) // 8)).sum()
    all_sizes = jax.lax.all_gather(nbytes, "dp")
    my = jax.lax.axis_index("dp")
    offset = jnp.where(jnp.arange(all_sizes.shape[0]) < my, all_sizes, 0).sum()
    return dense, widths, hdr, nbytes[None], offset[None]


def dp_encode(mesh: Mesh, rows: np.ndarray, elem_sz: int, codec: str = "delta"):
    """Sharded block-parallel encode pass.

    rows: (total_rows, D) with total_rows divisible by (n_devices * 8).
    Returns per-shard dense payloads, widths, headers, sizes and offsets;
    the host (or an ordered device gather) lays out the final stream.
    """
    n_dev = mesh.devices.size
    fn = shard_map_encode(mesh, elem_sz, codec)
    return fn(jnp.asarray(rows, jnp.int32))


@functools.lru_cache(maxsize=None)
def _shard_map_encode_cached(mesh: Mesh, elem_sz: int, codec: str):
    f = functools.partial(_shard_encode, elem_sz=elem_sz, codec=codec)
    mapped = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("dp", None),),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
    )
    return jax.jit(mapped)


def shard_map_encode(mesh: Mesh, elem_sz: int, codec: str):
    return _shard_map_encode_cached(mesh, elem_sz, codec)


# --------------------------------------------------------------- decode


def _shard_decode(dense: jnp.ndarray, widths: jnp.ndarray, elem_sz: int):
    """Per-shard delta decode with distributed prefix fixup.

    dense: (local_nb, 8, MAXB) int32; widths: (local_nb, D) int32.
    """
    eb = 8 * elem_sz
    errs = unpack_rows_rowmajor(dense, widths)
    nb, _, ndims = errs.shape
    deltas = zigzag_decode(errs.reshape(nb * BLOCK_SZ, ndims), eb)
    local = jnp.cumsum(deltas, axis=0, dtype=jnp.int32)
    # exclusive cross-shard prefix of per-shard delta sums (rides ICI)
    shard_sum = local[-1]
    all_sums = jax.lax.all_gather(shard_sum, "dp")  # (n_dev, D)
    my = jax.lax.axis_index("dp")
    prefix = jnp.where(
        (jnp.arange(all_sums.shape[0]) < my)[:, None], all_sums, 0).sum(axis=0)
    return (local + prefix[None, :]) & ((1 << eb) - 1)


@functools.lru_cache(maxsize=None)
def _shard_map_decode_cached(mesh: Mesh, elem_sz: int):
    f = functools.partial(_shard_decode, elem_sz=elem_sz)
    mapped = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P("dp"),
    )
    return jax.jit(mapped)


def dp_delta_decode(mesh: Mesh, dense: np.ndarray, widths: np.ndarray,
                    elem_sz: int):
    """Block-parallel delta decode: local unpack+cumsum, ICI prefix fixup."""
    fn = _shard_map_decode_cached(mesh, elem_sz)
    return fn(jnp.asarray(dense, jnp.int32), jnp.asarray(widths, jnp.int32))


# --------------------------------------------------------------- full step


def dp_compress(mesh: Mesh, flat: np.ndarray, ndims: int,
                codec: str = "delta") -> bytes:
    """Multi-chip encode producing the byte-exact single-stream output.

    Blocks are sharded across the mesh; forecaster boundary state rides
    ``ppermute`` (delta), so the per-block errors/widths equal the
    single-chip pass. The emission plan (RLE runs can cross shard
    boundaries) and final layout run on host over the gathered per-block
    summaries — the "ordered gather of packed shards" of the north star.

    For "delta" the result is byte-identical to ``encoder.compress``.
    For "xff" shards are independent streams (the coefficient recurrence
    does not cross chips), so use per-shard streams + checkpoint sidecars
    for exact multi-chip FIRE.
    """
    from .. import encoder as _enc
    from ..constants import MIN_DATA_SIZE
    from ..golden.stream import write_metadata_rle
    from ..planner import build_plan

    flat = np.ascontiguousarray(flat)
    elem_sz = flat.dtype.itemsize
    n = flat.size
    if n < MIN_DATA_SIZE:
        return write_metadata_rle(0, n, ndims) + flat.tobytes()
    n_dev = mesh.devices.size
    block_elems = BLOCK_SZ * ndims
    nb_max = n // block_elems
    # pad blocks to a multiple of the mesh so every real block is encoded
    # (padding rows are zeros at the end and never referenced by the plan)
    nb_pad = -(-nb_max // n_dev) * n_dev
    rows = np.zeros((nb_pad * BLOCK_SZ, ndims), dtype=np.int32)
    rows[: nb_max * BLOCK_SZ] = flat[: nb_max * block_elems].reshape(
        -1, ndims)

    dense, widths, hdr, sizes, offsets = dp_encode(
        mesh, rows, elem_sz, codec)
    widths_np = np.asarray(widths)
    hdr_np = np.asarray(hdr).astype(np.uint8)
    dense_np = np.asarray(dense)
    zero_flags = np.asarray(widths_np.sum(axis=1) == 0)[:nb_max]

    plan = build_plan(zero_flags, n, ndims, codec == "xff")
    return _enc.assemble_stream(
        plan, widths_np, hdr_np, dense_np, ndims, elem_sz, False,
        flat[n - plan.remaining_elems:])


def training_step(mesh: Mesh, rows: np.ndarray, elem_sz: int = 1,
                  codec: str = "delta"):
    """One full sharded encode->decode round-trip step (the framework's
    analogue of a model's train step): returns (decoded rows, total bytes).
    Used by the multichip dry run and scaling benchmarks."""
    dense, widths, hdr, sizes, offsets = dp_encode(mesh, rows, elem_sz, codec)
    if codec == "delta":
        decoded = dp_delta_decode(mesh, dense, widths, elem_sz)
    else:
        # FIRE shards are independent streams; decode locally per shard
        decoded = None
    total_bytes = np.asarray(sizes).sum()
    return decoded, total_bytes
