"""Device mesh helpers.

The reference's process-per-GPU + NCCL topology (trainer/bmuf.py:59,
torch.distributed.launch) becomes a single-program SPMD mesh: one
``jax.sharding.Mesh`` whose ``data`` axis carries data parallelism, with
XLA collectives over ICI replacing master-centric reduce+broadcast.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, leading_unsharded: int = 0) -> NamedSharding:
    """Shard the batch axis over the mesh; ``leading_unsharded`` extra axes
    (e.g. a sync-period axis) stay replicated."""
    spec = P(*([None] * leading_unsharded + ["data"]))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, leading_unsharded: int = 0) -> dict:
    sh = data_sharding(mesh, leading_unsharded)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    if jax.process_count() > 1:
        # Multi-host: leaves created by ordinary jnp ops are committed to
        # the process-local default device; device_put cannot scatter a
        # committed single-device array onto a cross-process sharding.
        # Bounce through host numpy (uncommitted) — every process holds
        # the same values (same seeds), so the replication is consistent.
        tree = jax.device_get(tree)
    return jax.device_put(tree, replicated(mesh))
