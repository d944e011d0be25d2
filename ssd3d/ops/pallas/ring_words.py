"""Pallas kernel: fused pairwise-distance + ring-mask bit-packing.

The multi-scale ball query needs, per (query, 16-point group), a packed
16-bit word of "point j is inside ring k". The XLA formulation materializes
the [m, n] distance matrix in HBM and re-reads it per ring (~39 ms of the
3DSSD forward at layer-1 scale). This kernel keeps everything in VMEM: for
each query tile it streams the points in 512-wide blocks, computes the
distance block on the VPU, and packs each ring's mask with an MXU matmul
against the constant bit matrix P[j, w] = 2^(j mod 16) * [j div 16 == w].

Exactness: the mask entries (0/1) and the bit weights (powers of two up to
2^15) are all exactly representable in bf16, so a single-pass bf16 MXU matmul
produces the packed words exactly. Distances use direct differences, so the
query point's self-distance is exactly 0 (the dilated ring's self-inclusion
rule). Output words feed ssd3d.ops.grouping._select_from_words unchanged.
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


def _kernel(n: int, rings: tuple, q_ref, pts_ref, out_ref, pmat_ref):
    """q_ref: [1, QT, 3]; pts_ref: [1, 3, n]; out_ref: [1, R, QT, n/16];
    pmat_ref: [NB, NB//W] constant bit matrix (VMEM scratch, filled here)."""
    nblocks = n // _NB
    wpb = _NB // _W  # words per block

    # constant bit matrix P[j, w] = 2^(j % 16) if j // 16 == w else 0
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (_NB, wpb), 0)
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (_NB, wpb), 1)
    bitval = jnp.exp2((j_ids % _W).astype(jnp.float32))
    pmat_ref[:] = jnp.where(j_ids // _W == w_ids, bitval, 0.0)

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
            words = jnp.dot(
                valid.astype(jnp.bfloat16), pmat,
                preferred_element_type=jnp.float32,
            )  # [QT, wpb] exact
            out_ref[0, k, :, pl.ds(pl.multiple_of(b * wpb, 128), wpb)] = words
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def ring_words_pallas(xyz: Array, new_xyz: Array, rings: tuple) -> Array:
    """xyz: [b, n, 3]; new_xyz: [b, m, 3]; rings: ((lo2, hi2, self), ...)
    -> packed words f32 [b, R, m, n/16]."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    assert n % _NB == 0, n
    pad_m = (-m) % _QT
    q = new_xyz.astype(jnp.float32)
    if pad_m:
        q = jnp.pad(q, ((0, 0), (0, pad_m), (0, 0)))
    mt = (m + pad_m) // _QT
    pts_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [b, 3, n]
    R = len(rings)

    kernel = functools.partial(_kernel, n, tuple(rings))
    out = pl.pallas_call(
        kernel,
        grid=(b, mt),
        in_specs=[
            pl.BlockSpec((1, _QT, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, _QT, n // _W), lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, R, m + pad_m, n // _W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_NB, _NB // _W), jnp.float32)],
    )(q, pts_t)
    return out[:, :, :m]
