"""Pallas TPU kernel for farthest point sampling (D-FPS).

FPS is inherently sequential in the sample count m (each pick depends on the
running min-distance field), so the right TPU shape is: keep the ENTIRE loop
in one kernel with all state resident in VMEM — the xyz coordinates (laid out
coordinate-major), the [n] min-distance field, and the output index vector —
so the m iterations run back-to-back on the VPU with zero HBM traffic and no
per-step dispatch.

Layout: n points are viewed as an (8, n/8) tile so every elementwise pass uses
all 8 VPU sublanes. Argmax is a two-pass max + first-match-index reduction;
the chosen point's coordinates are extracted with masked reductions instead of
dynamic lane indexing (which Mosaic lowers poorly).

Replaces the reference CUDA kernel tf_sampling_g.cu:124 (one block per batch
element, shared-memory tree reduction) — same contract: first pick is index 0,
ties go to the lowest index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SUBLANES = 8


def _fps_kernel(n: int, m: int, xyz_ref, out_ref, dist_ref, idx_scratch):
    """One batch element. xyz_ref: [3, 8, n/8]; out_ref: [1, m] int32."""
    cols = n // _SUBLANES
    xs = xyz_ref[0, 0]  # [8, cols]
    ys = xyz_ref[0, 1]
    zs = xyz_ref[0, 2]

    # linear index of element (r, c) = r * cols + c (row-major over the tile)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, cols), 1)
    linear = row_ids * cols + col_ids

    dist_ref[:] = jnp.full((_SUBLANES, cols), jnp.inf, jnp.float32)
    idx_scratch[:] = jnp.zeros((1, m), jnp.int32)  # pick 0 = index 0

    def body(j, carry):
        sel_x, sel_y, sel_z = carry
        d = (xs - sel_x) ** 2 + (ys - sel_y) ** 2 + (zs - sel_z) ** 2
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist

        best_val = jnp.max(dist)
        big = jnp.int32(n)
        best = jnp.min(jnp.where(dist == best_val, linear, big))

        hit = linear == best
        nx = jnp.sum(jnp.where(hit, xs, 0.0))
        ny = jnp.sum(jnp.where(hit, ys, 0.0))
        nz = jnp.sum(jnp.where(hit, zs, 0.0))

        slot = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        idx_scratch[:] = jnp.where(slot == j, best, idx_scratch[:])
        return nx, ny, nz

    # pick 0 is point 0; iterations 1..m-1 measure distance to the last pick
    x0 = xs[0, 0]
    y0 = ys[0, 0]
    z0 = zs[0, 0]
    jax.lax.fori_loop(1, m, body, (x0, y0, z0))
    out_ref[0] = idx_scratch[:]


def _fps_batch_kernel(n: int, m: int, xyz_ref, out_ref, dist_ref, idx_scratch):
    """All batch rows advance together: one fori_loop iteration does the
    distance update + per-row argmax for EVERY cloud in the tile, amortizing
    the sequential-loop overhead across the batch. xyz_ref: [3, bt, n]."""
    bt = xyz_ref.shape[1]
    xs = xyz_ref[0]  # [bt, n]
    ys = xyz_ref[1]
    zs = xyz_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)

    dist_ref[:] = jnp.full((bt, n), jnp.inf, jnp.float32)
    idx_scratch[:] = jnp.zeros((bt, m), jnp.int32)  # pick 0 = index 0

    def body(j, carry):
        sel_x, sel_y, sel_z = carry  # [bt, 1] each
        d = (xs - sel_x) ** 2 + (ys - sel_y) ** 2 + (zs - sel_z) ** 2
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        vmax = jnp.max(dist, axis=1, keepdims=True)  # [bt, 1]
        best = jnp.min(
            jnp.where(dist == vmax, lane, jnp.int32(n)), axis=1, keepdims=True
        )
        hit = lane == best
        nx = jnp.sum(jnp.where(hit, xs, 0.0), axis=1, keepdims=True)
        ny = jnp.sum(jnp.where(hit, ys, 0.0), axis=1, keepdims=True)
        nz = jnp.sum(jnp.where(hit, zs, 0.0), axis=1, keepdims=True)
        slot = jax.lax.broadcasted_iota(jnp.int32, (bt, m), 1)
        idx_scratch[:] = jnp.where(slot == j, best, idx_scratch[:])
        return nx, ny, nz

    jax.lax.fori_loop(
        1, m, body,
        (xs[:, 0:1], ys[:, 0:1], zs[:, 0:1]),
    )
    out_ref[:] = idx_scratch[:]


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_pallas_batch(xyz: Array, npoint: int) -> Array:
    """Batch-parallel variant: the whole batch tile lives in VMEM and every
    loop iteration advances all clouds. Preferred for b >= 4."""
    b, n, _ = xyz.shape
    bt = min(b, 16)  # VMEM: 3*bt*n*4 + bt*n*4 bytes; 16x16384 ~= 4 MB
    pad_b = (-b) % bt
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))  # [3, b, n]
    if pad_b:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, pad_b), (0, 0)))
    nb = (b + pad_b) // bt

    kernel = functools.partial(_fps_batch_kernel, n, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, bt, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((bt, npoint), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b + pad_b, npoint), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bt, n), jnp.float32),
            pltpu.VMEM((bt, npoint), jnp.int32),
        ],
    )(xyz_t)
    return out[:b]


def _ffps_kernel(n: int, m: int, bt: int, mat_ref, out_ref, dist_ref):
    """F-FPS over a precomputed squared-distance matrix, all clouds of the
    tile advancing together. mat_ref: [bt, 8, n, n/8] — mat[c, s, j, l] is
    d²(j, s·(n/8)+l), i.e. the row of point j lives at [c, :, j, :] as a
    full-sublane (8, n/8) tile. This s-above-j axis order matches the layout
    the TPU dot emitter produces for the HIGHEST-precision distance einsum
    ('bnc,bskc->bsnk'), so the producer feeds the kernel with NO
    layout-assignment copy (the n-major order costs a 537 MB copy/step at
    the flagship's 4096-point segment — tools/dump_hlo.py).
    out_ref: [bt, m] int32 in SMEM (scalar stores); dist_ref: [bt, 8, n/8].

    Same contract as the jnp reference (sampling.py:69): pick 0 is index 0,
    min-dist update reads row `last`, ties resolve to the lowest index — with
    the linear index of element (s, l) being s * (n/8) + l."""
    cols = n // _SUBLANES
    linear = (
        jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, cols), 1)
    )
    dist_ref[:] = jnp.full((bt, _SUBLANES, cols), jnp.inf, jnp.float32)
    for c in range(bt):
        out_ref[c, 0] = 0

    def body(j, last):
        nxt = []
        for c in range(bt):
            row = mat_ref[c, :, pl.ds(last[c], 1), :][:, 0, :]  # [8, cols]
            dist = jnp.minimum(dist_ref[c], row)
            dist_ref[c] = dist
            vmax = jnp.max(dist)
            best = jnp.min(jnp.where(dist == vmax, linear, jnp.int32(n)))
            out_ref[c, j] = best
            nxt.append(best)
        return tuple(nxt)

    jax.lax.fori_loop(1, m, body, (jnp.int32(0),) * bt)


@functools.partial(jax.jit, static_argnums=(1,))
def ffps_pallas(dist: Array, npoint: int) -> Array:
    """F-FPS from a squared-distance matrix, whole loop in VMEM.

    dist: [b, n, n] float32 -> int32 [b, npoint]. Replaces the XLA while-loop
    lowering of sampling.farthest_point_sample_from_dist (per-iteration row
    gather + update as separate HLOs, ~2.3 ms/step at flagship shapes; this
    kernel ~0.4 ms)."""
    b, n, _ = dist.shape
    assert n % _SUBLANES == 0, n
    # single grid step, whole batch resident: b * n * n * 4 bytes of VMEM
    # (callers gate on <= ~80 MB; flagship is 8 x 1024 x 1024 = 32 MB)
    cols = n // _SUBLANES
    mat = jnp.transpose(
        dist.astype(jnp.float32).reshape(b, n, _SUBLANES, cols), (0, 2, 1, 3)
    )
    return ffps_pallas_pre(mat, npoint)


@functools.partial(jax.jit, static_argnums=(1,))
def ffps_pallas_pre(mat: Array, npoint: int) -> Array:
    """VMEM F-FPS over an s-major tiled matrix [b, 8, n, n/8]
    (mat[c, s, j, l] = d²(j, s·(n/8)+l); see _ffps_kernel for why)."""
    b, n = mat.shape[0], mat.shape[2]
    cols = n // _SUBLANES

    kernel = functools.partial(_ffps_kernel, n, npoint, b)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, _SUBLANES, n, cols), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((b, npoint), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b, _SUBLANES, cols), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(mat)
    return out


def _ffps_hbm_kernel(n: int, m: int, b: int, mat_ref, out_ref,
                     dist_ref, block_ref, sem):
    """F-FPS with the distance matrix resident in HBM: only the picked
    point's row is DMA'd into VMEM each iteration. All batch elements
    advance together so their row DMAs issue back-to-back and the
    latencies overlap (the pick order is data-dependent, so rows cannot
    be prefetched — overlapping ACROSS clouds is the available
    parallelism).

    mat_ref: ANY [b, n/8, 8, n] — a pure bitcast view of the square
    matrix exactly as the pairwise einsum emits it ([b, p, t], t minor,
    (8,128)-tiled over (p, t)). The view's minor (8, n) dims keep that
    tiling, so no relayout is needed — the old s-major flat contract
    re-tiled the buffer, which XLA satisfied with a full-matrix layout
    copy (537 MB/step measured on the flagship's 4096-point segment,
    tools/dump_hlo.py). The cost of tiling-compatibility: a single row
    cannot be sliced out of HBM (a tile spans 8 rows; Mosaic rejects
    extent-1 sublane slices), so each iteration DMAs the ALIGNED 8-row
    block containing the pick (p//8 indexes an untiled dim) and isolates
    row p%8 in VMEM with a masked sublane-min — 8x the DMA bytes of a
    bare row, still ~5x cheaper than the relayout copy it replaces.
    The per-point dist state is batched over clouds ([b, n], b in
    sublanes) so the min/argmax run once per iteration for the whole
    batch.
    out_ref: SMEM [b, m]; dist_ref: VMEM [b, n]; block_ref: VMEM
    [b, 8, n]; sem: DMA semaphore array [b].
    """
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, n), 0)
    linear = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    dist_ref[:] = jnp.full((b, n), jnp.inf, jnp.float32)
    for c in range(b):
        out_ref[c, 0] = 0

    def body(j, last):
        copies = []
        for c in range(b):
            cp = pltpu.make_async_copy(
                mat_ref.at[c, last[c] // _SUBLANES], block_ref.at[c],
                sem.at[c],
            )
            cp.start()
            copies.append(cp)
        rows = []
        for c in range(b):
            copies[c].wait()
            r = last[c] % _SUBLANES
            rows.append(jnp.min(
                jnp.where(sub_iota == r, block_ref[c], jnp.inf), axis=0
            ))
        dist = jnp.minimum(dist_ref[:], jnp.stack(rows))  # [b, n]
        dist_ref[:] = dist
        vmax = jnp.max(dist, axis=1, keepdims=True)       # [b, 1]
        cand = jnp.where(dist == vmax, linear, jnp.int32(n))
        best = jnp.min(cand, axis=1)                      # [b]
        nxt = []
        for c in range(b):
            out_ref[c, j] = best[c]
            nxt.append(best[c])
        return tuple(nxt)

    jax.lax.fori_loop(1, m, body, (jnp.int32(0),) * b)


@functools.partial(jax.jit, static_argnums=(1,))
def ffps_pallas_hbm(dist: Array, npoint: int) -> Array:
    """F-FPS for matrices too large for VMEM (the 4096-point fusion-sampling
    segment: 4096^2 f32 = 64 MB per cloud). The matrix stays in HBM; each
    iteration streams just the picked row (n*4 bytes) per cloud.

    dist: [b, n, n] float32 -> int32 [b, npoint]."""
    return ffps_pallas_hbm_rows(dist.astype(jnp.float32), npoint)


@functools.partial(jax.jit, static_argnums=(1,))
def ffps_pallas_hbm_rows(mat: Array, npoint: int) -> Array:
    """HBM-streaming F-FPS over the square matrix [b, n, n] in its native
    row-major layout (see _ffps_hbm_kernel for why any view that re-tiles
    the minor axis forces a full-matrix relayout copy). Requires
    n % 128 == 0 (the streamed row blocks are lane vectors)."""
    b, n = mat.shape[0], mat.shape[1]
    assert n % 128 == 0, n

    kernel = functools.partial(_ffps_hbm_kernel, n, npoint, b)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((b, npoint), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, npoint), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((b, n), jnp.float32),
            pltpu.VMEM((b, _SUBLANES, n), jnp.float32),
            pltpu.SemaphoreType.DMA((b,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(mat.reshape(b, n // _SUBLANES, _SUBLANES, n))


def fps_pallas(xyz: Array, npoint: int) -> Array:
    """xyz: [b, n, 3] float32 -> int32 [b, npoint]. Dispatches between the
    batch-parallel kernel (amortizes loop overhead across clouds) and the
    single-cloud tiled kernel (full VPU-sublane use at small batch)."""
    b, n, _ = xyz.shape
    if b >= 4 and n >= 128:
        return _fps_pallas_batch(xyz, npoint)
    return _fps_pallas_tiled(xyz, npoint)


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_pallas_tiled(xyz: Array, npoint: int) -> Array:
    """Single-cloud kernel: n viewed as (8, n/8) so small batches still use
    all VPU sublanes. n must be divisible by 8."""
    b, n, _ = xyz.shape
    assert n % _SUBLANES == 0, f"n={n} must be a multiple of {_SUBLANES}"
    cols = n // _SUBLANES
    # coordinate-major layout: [b, 3, 8, n/8]
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1)).reshape(
        b, 3, _SUBLANES, cols
    )

    kernel = functools.partial(_fps_kernel, n, npoint)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, _SUBLANES, cols),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_SUBLANES, cols), jnp.float32),
            pltpu.VMEM((1, npoint), jnp.int32),
        ],
    )(xyz_t)
    return out.reshape(b, npoint)
