"""Pallas TPU kernel for three_nn (3-nearest-known-points search).

The PointRCNN FP decoder calls three_nn four times per step, the largest at
16,384 unknowns x 4,096 knowns (reference CUDA counterpart:
lib/utils/tf_ops/interpolation/tf_interpolate_g.cu — a per-unknown scan over
all knowns keeping a 3-best). The plain-XLA path (ops/interpolate.py
`_three_nn_jnp`) chunks queries through `lax.map` and materializes each
[chunk, m] distance tile in HBM, re-reading it for three masked argmin
passes; profiling named this chain the two-stage throughput bottleneck.

Kernel shape: one grid step owns a tile of queries; the knowns stay resident
in VMEM coordinate-major ([3, m]: one lane vector per coordinate) so the
distance tile is three broadcast subtract-square-accumulate passes on the
VPU — exact per-coordinate differences, no a²+b²−2ab cancellation. Neighbor
indices and the tie contract (equal distances fill slots in index order)
match the jnp reference exactly; distances agree to ULP (XLA may associate
the 3-coordinate sum differently). The [tq, m] tile lives only in VMEM
scratch; the three min/argmin passes run back-to-back with zero HBM traffic.

No gradient: the reference op registers none (gradients flow through
three_interpolate to features only; xyz inputs are non-parameter leaves in
every FP call site), so the dispatch wraps inputs in stop_gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _three_nn_kernel(m: int, tq: int, q_ref, k_ref, dist_ref, idx_ref, d_scr):
    """q_ref: [1, tq, 3]; k_ref: [1, 3, m]; dist/idx_ref: [1, tq, 3];
    d_scr: [tq, m] f32."""
    kx = k_ref[0, 0:1, :]  # [1, m]
    ky = k_ref[0, 1:2, :]
    kz = k_ref[0, 2:3, :]
    qx = q_ref[0, :, 0:1]  # [tq, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]
    # same association as jnp.sum(diff**2, -1): ((dx²+dy²)+dz²)
    d_scr[:] = ((qx - kx) ** 2 + (qy - ky) ** 2) + (qz - kz) ** 2

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, m), 1)
    vals, idxs = [], []
    for _ in range(3):
        d = d_scr[:]
        v = jnp.min(d, axis=1, keepdims=True)  # [tq, 1]
        i = jnp.min(
            jnp.where(d == v, lane, jnp.int32(m)), axis=1, keepdims=True
        )
        vals.append(v)
        idxs.append(i)
        d_scr[:] = jnp.where(lane == i, jnp.inf, d)
    dist_ref[0] = jnp.concatenate(vals, axis=1)
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


def _tile_q(n: int, m: int) -> int:
    """Query-tile size: keep the [tq, m] f32 distance tile near 1 MB.
    Several same-shaped live values coexist (the tile, the lane iota, the
    where intermediates); at 8 MB tiles they overflow physical VMEM and
    Mosaic's scheduling collapses (measured 875 us/step vs ~20 us here)."""
    tq = max(8, min(256, (1 << 20) // (4 * m)))
    tq -= tq % 8
    if n < tq:
        tq = n + ((-n) % 8)
    return tq


@jax.jit
def three_nn_pallas(xyz1: Array, xyz2: Array):
    """xyz1 (unknown): [b, n, 3]; xyz2 (known): [b, m, 3]
    -> (dist2 [b, n, 3] f32, idx [b, n, 3] i32). Indices and tie order
    identical to the jnp reference; distances to ULP."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tq = _tile_q(n, m)
    pad = (-n) % tq
    q = jnp.pad(xyz1.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    kt = jnp.transpose(xyz2.astype(jnp.float32), (0, 2, 1))  # [b, 3, m]
    ntiles = (n + pad) // tq

    kernel = functools.partial(_three_nn_kernel, m, tq)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n + pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, n + pad, 3), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((tq, m), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(q, kt)
    if pad:
        dist = dist[:, :n]
        idx = idx[:, :n]
    return dist, idx
