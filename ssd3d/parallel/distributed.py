"""Multi-host (multi-process) initialization.

One code path serves every scale: the train step is jitted over a global
`Mesh` of `jax.devices()`, so going multi-host only requires (a) starting
the JAX coordination service and (b) assembling global batch arrays from
per-process data. On TPU pods `jax.distributed.initialize()` picks its
arguments up from the TPU environment automatically; elsewhere (CPU
simulation, GPU clusters) they come from the SSD3D_DIST_* variables.

The reference has no multi-host story at all — its parallelism is
single-process in-graph towers (trainer.py:120-149); this subsystem is
mesh-native design, not a port.

Environment contract (set on every process):
    SSD3D_DIST_COORDINATOR   host:port of process 0
    SSD3D_DIST_NUM_PROCESSES total process count
    SSD3D_DIST_PROCESS_ID    this process's rank
Or set SSD3D_DIST_AUTO=1 on a TPU pod to let JAX autodetect everything.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize_from_env(log=print) -> bool:
    """Start jax.distributed if the SSD3D_DIST_* env contract is present.
    Must run before any other jax API touches the backend. Returns True
    when a multi-process runtime was initialized."""
    if os.environ.get("SSD3D_DIST_AUTO"):
        jax.distributed.initialize()
    elif os.environ.get("SSD3D_DIST_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["SSD3D_DIST_COORDINATOR"],
            num_processes=int(os.environ["SSD3D_DIST_NUM_PROCESSES"]),
            process_id=int(os.environ["SSD3D_DIST_PROCESS_ID"]),
        )
    else:
        return False
    log(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global "
        "devices"
    )
    return True


def make_global_batch(sharding, batch: dict) -> dict:
    """Assemble globally-sharded arrays from the full per-host batch.

    The loader sequence is deterministic (samples are pure functions of
    (seed, epoch, index)), so any host can materialize any global-batch
    row. In the common case the trainer narrows each host's loader to just
    its own contiguous row range (`loader.row_range`, trainer.py per-host
    input sharding) and `batch` holds only those rows at their global
    offsets; when a host's rows aren't one contiguous run (e.g. interleaved
    mesh orders) the trainer leaves `row_range` unset and every host loads
    the full global batch — O(global batch) per host, correct for any
    device permutation because the callback slices by the sharding's own
    index map."""
    def globalize(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return {k: globalize(v) for k, v in batch.items()}
