"""Device mesh + sharding helpers.

The reference's parallelism is single-process in-graph GPU towers with
host-pinned variables and a gpu:0 gradient average (trainer.py:120-149,
trainer_utils.py:23) plus NCCL all-reduce for SyncBN only (sync_bn.py:56).

TPU-native replacement: one jit-compiled train step over a
`jax.sharding.Mesh` with the batch axis sharded on 'data' and parameters
replicated. XLA GSPMD inserts the gradient psum over ICI automatically, and
batch-norm statistics computed with plain `jnp.mean` over the globally
sharded batch ARE synchronized batch norm — no separate comm backend, no
special-cased SyncBN module. Multi-host (DCN) falls out of
jax.distributed + a larger mesh with the same annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
