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
    """1-D mesh over the global devices, default enumeration order.

    SSD3D_MESH_INTERLEAVE=k reorders the axis by stride k (devices
    [0,k,2k,...,1,k+1,...]) — the layout knob for topologies where the
    fastest links don't follow enumeration order. Under multi-process it
    makes each host's batch rows non-contiguous, which is also how the
    trainer's per-host-loading fallback path gets exercised for real."""
    import os

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    k = int(os.environ.get("SSD3D_MESH_INTERLEAVE", "1"))
    if k > 1 and len(devices) % k == 0:
        devices = [d for i in range(k) for d in devices[i::k]]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data",
                   min_size: int = 1 << 14):
    """FSDP-style sharding pytree for a train state (params + optimizer
    moments): every leaf whose element count reaches `min_size` shards its
    largest `axis`-divisible dimension across the mesh; everything else
    (scalars, BN stats, small biases) stays replicated.

    Under GSPMD this is ZeRO-3 semantics without any runtime machinery:
    XLA inserts the all-gather of each weight right before use and keeps
    parameters + Adam moments resident at 1/n per chip — the memory
    headroom path to nuScenes-scale models. The reference has no
    counterpart (its variables are host-pinned singletons,
    trainer_utils.py:23); this is mesh-native design, not a port."""
    n = mesh.shape[axis]

    def leaf(x):
        shape = tuple(getattr(x, "shape", ()))
        if shape and int(np.prod(shape)) >= min_size:
            divisible = [(d, i) for i, d in enumerate(shape) if d % n == 0]
            if divisible:
                d, i = max(divisible)
                spec = [None] * len(shape)
                spec[i] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, tree)
