"""Pallas kernel: fused pairwise-distance + ring-mask bit-packing + counts.

The multi-scale ball query needs, per (query, 16-point group), a packed
16-bit word of "point j is inside ring k", plus per 256-point block the
number of in-ring points (the first-k selection's coarse level). The XLA
formulation materializes the [m, n] distance matrix in HBM and re-reads it
per ring (~39 ms of the 3DSSD forward at layer-1 scale). This kernel keeps
everything in VMEM: for each query tile it streams the points in 2048-wide
blocks, computes the distance block on the VPU, packs each ring's mask with
an MXU matmul against the constant bit matrix P[j, w] = 2^(j mod 16) *
[j div 16 == w], and accumulates block counts with a second 0/1 matmul.

Exactness: the mask entries (0/1) and the bit weights (powers of two up to
2^15) are all exactly representable in bf16, so a single-pass bf16 MXU matmul
produces the packed words exactly; the count matmul's operands are 0/1 and
accumulate in f32 (counts <= 256, exact). Distances use direct differences,
so the query point's self-distance is exactly 0 (the dilated ring's
self-inclusion rule). Outputs feed ssd3d.ops.grouping._select_from_words.

Counts are emitted TRANSPOSED ([b, n/BS, m]) because the per-chunk store
then lands on the sublane dimension — dynamic lane-dim stores crash the
terminal's older libtpu, dynamic sublane stores are fine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_QT = 256  # queries per grid step
_NB = 2048  # points per inner block (=> 128 words: aligned lane stores)
_W = 16  # bits per word
BLOCK = 256  # points per count block (selection's coarse level)


_NCHUNK = 16384  # points per grid slab (keeps the words block <= 1 MB/ring)


def _kernel(nchunk: int, rings: tuple, q_ref, pts_ref, *refs):
    """q_ref: [1, QT, 3]; pts_ref: [1, 3, nchunk]; refs: per ring a words ref
    [1, nchunk/16, QT] (TRANSPOSED — see ring_words_pallas), then per ring a
    counts ref [1, nchunk/BLOCK, QT], then the [NB, NB//W]
    constant-bit-matrix VMEM scratch (filled here)."""
    nblocks = nchunk // _NB
    wpb = _NB // _W  # words per inner block
    bpb = _NB // BLOCK  # count blocks per inner block
    R = len(rings)
    words_refs = refs[:R]
    cnt_refs = refs[R:2 * R]
    pmat_ref = refs[2 * R]

    # constant bit matrix P[j, w] = 2^(j % 16) if j // 16 == w else 0
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (_NB, wpb), 0)
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (_NB, wpb), 1)
    bitval = jnp.exp2((j_ids % _W).astype(jnp.float32))
    pmat_ref[:] = jnp.where(j_ids // _W == w_ids, bitval, 0.0)

    # constant count matrix C[blk, j] = 1 if j // BLOCK == blk else 0
    cb = jax.lax.broadcasted_iota(jnp.int32, (bpb, _NB), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (bpb, _NB), 1)
    cmat = (cj // BLOCK == cb).astype(jnp.bfloat16)

    qx = q_ref[0, :, 0:1]  # [QT, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]

    def body(b, _):
        px = pts_ref[0, 0:1, pl.ds(b * _NB, _NB)]  # [1, NB]
        py = pts_ref[0, 1:2, pl.ds(b * _NB, _NB)]
        pz = pts_ref[0, 2:3, pl.ds(b * _NB, _NB)]
        d2 = (qx - px) ** 2 + (qy - py) ** 2 + (qz - pz) ** 2  # [QT, NB]
        pmat = pmat_ref[:].astype(jnp.bfloat16)
        for k, (lo2, hi2, self_incl) in enumerate(rings):
            valid = (d2 >= lo2) & (d2 < hi2)
            if self_incl:
                valid = valid | (d2 == 0.0)
            vb = valid.astype(jnp.bfloat16)
            # transposed words straight off the MXU ([wpb, QT], queries in
            # lanes) — matches the transposed output block, so neither the
            # kernel nor XLA ever relayouts the words
            words_t = jax.lax.dot_general(
                pmat, vb, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [wpb, QT] exact
            words_refs[k][0, pl.ds(b * wpb, wpb), :] = words_t
            cnts = jax.lax.dot_general(
                cmat, vb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [bpb, QT] exact (0/1 operands, f32 accumulate)
            cnt_refs[k][0, pl.ds(b * bpb, bpb), :] = cnts
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def ring_words_pallas(xyz: Array, new_xyz: Array, rings: tuple):
    """xyz: [b, n, 3]; new_xyz: [b, m, 3]; rings: ((lo2, hi2, self), ...)
    -> (words per ring: f32 [b, n/16, m], counts per ring: f32
    [b, n/BLOCK, m]) — BOTH query-trailing. The select machinery
    (_select_from_words_t) is written query-trailing, so the kernel
    outputs feed it in their default layouts; the query-major words
    emission cost three 134 MB layout-assignment copies per step at the
    flagship layer-1 scale (tools/dump_hlo.py)."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    assert n % _NB == 0, n
    # Slab the point axis so each grid step's words block stays ~1 MB/ring:
    # at n=65536 (nuScenes) the un-slabbed [QT, n/16] block is 4 MB/ring and
    # blows the 16 MB scoped-VMEM limit (3 rings, double-buffered).
    nchunk = _NCHUNK if n > _NCHUNK and n % _NCHUNK == 0 else n
    nct = n // nchunk
    pad_m = (-m) % _QT
    q = new_xyz.astype(jnp.float32)
    if pad_m:
        q = jnp.pad(q, ((0, 0), (0, pad_m), (0, 0)))
    mp = m + pad_m
    mt = mp // _QT
    pts_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [b, 3, n]
    R = len(rings)
    nbt = n // BLOCK
    cbc = nchunk // BLOCK  # count blocks per slab
    wpc = nchunk // _W  # words per slab

    kernel = functools.partial(_kernel, nchunk, tuple(rings))
    out_shapes = [
        jax.ShapeDtypeStruct((b, n // _W, mp), jnp.float32) for _ in range(R)
    ] + [jax.ShapeDtypeStruct((b, nbt, mp), jnp.float32) for _ in range(R)]
    out_specs = [
        pl.BlockSpec((1, wpc, _QT), lambda i, j, c: (i, c, j),
                     memory_space=pltpu.VMEM)
        for _ in range(R)
    ] + [
        pl.BlockSpec((1, cbc, _QT), lambda i, j, c: (i, c, j),
                     memory_space=pltpu.VMEM)
        for _ in range(R)
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(b, mt, nct),
        in_specs=[
            pl.BlockSpec((1, _QT, 3), lambda i, j, c: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, nchunk), lambda i, j, c: (i, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((_NB, _NB // _W), jnp.float32)],
    )(q, pts_t)
    words = [w[:, :, :m] for w in outs[:R]]
    cnts = [c[:, :, :m] for c in outs[R:]]
    return words, cnts
