"""Device mesh helpers.

The reference is single-process (SURVEY §2.7: no NCCL/MPI); its scaling story
is rayon threads + one GPU. The TPU rebuild's multi-chip story is a 1-D data
mesh: the vector database is sharded row-wise over devices, queries are
replicated (or batch-sharded), and per-shard top-k results are merged with an
``all_gather`` over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_rows", "replicate", "DB_AXIS"]

#: mesh axis name the database rows are sharded over
DB_AXIS = "db"


def make_mesh(n_devices: int | None = None, axis: str = DB_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_rows(x: jax.Array, mesh: Mesh, axis: str = DB_AXIS) -> jax.Array:
    """Place ``x`` row-sharded over the mesh (rows must divide evenly;
    callers pad)."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x: jax.Array, mesh: Mesh) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))
