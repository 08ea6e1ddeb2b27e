"""Multi-host initialization and mesh construction.

The reference is single-threaded (SURVEY §2.10); the TPU-native scaling
story is dp sharding over a Mesh (shard.py). This module supplies the
multi-host framing mandated by SURVEY §2.10: jax.distributed bring-up
from standard cluster env vars, and meshes that span all hosts' devices.

On a single process (this environment, and the CPU test mesh) everything
degrades to local devices — the shard_map programs in shard.py are
identical either way, which is the point: the SPMD program is written
once and the runtime scales it.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when cluster env vars are present.

    Recognizes the standard JAX coordination variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    their auto-detectable TPU-pod equivalents). Returns True when a
    multi-process runtime was initialized. Safe to call repeatedly.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") != "localhost":
        # TPU pod: jax.distributed auto-detects everything
        jax.distributed.initialize()
        return True
    return False


def global_mesh(axis: str = "dp") -> Mesh:
    """A 1-D mesh over every device of every participating host.

    Sharded encode/decode (shard.py) over this mesh gives each host's
    chips a contiguous block range; the size all-gather + offset scan
    ride ICI within hosts and DCN across them — layout chosen so the
    heavy ppermute boundary handoffs are neighbor exchanges (at most one
    DCN hop per host boundary).
    """
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_rows(total_rows: int, block_rows: int = 8) -> slice:
    """The row range this process should feed into dp_encode under a
    global mesh: contiguous, block-aligned, in process order (so the
    concatenated stream equals the single-host stream)."""
    nproc = jax.process_count()
    pid = jax.process_index()
    blocks = total_rows // block_rows
    per = -(-blocks // nproc)
    lo = min(pid * per, blocks) * block_rows
    hi = min((pid + 1) * per, blocks) * block_rows
    return slice(lo, hi)
