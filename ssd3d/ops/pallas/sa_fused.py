"""Pallas kernel: fused SA-scale grouping — gather + center-subtract +
pointwise MLP (BN folded) + max-pool, one kernel per radius scale.

The unfused inference path materializes [b, m, ns, c] grouped tensors in HBM
(Pallas row gather), relays them out for the MLP convs (XLA picks an
m-minor layout for the channel contraction, forcing ~4 ms/step of pure
copies at flagship scale), runs the conv stack, and reduces. Here the
gathered rows never leave VMEM: each grid step gathers a query tile's rows
with dynamic sublane slices (the ops/pallas/gather.py pattern), subtracts
the centers, runs the (bf16 matmul + f32 BN affine + ReLU) chain on the MXU,
and writes only the [TM, c_out] pooled result.

Numerics mirror the unfused eval path: inputs/kernels cast to bf16 for the
dot (flax Dense(dtype=bf16)), bias added in bf16, BatchNorm eval reduced to
a f32 affine y * inv + shift with inv = rsqrt(var + eps) * scale,
shift = bias - mean * inv, then ReLU. Inference only (the train path keeps
the unfused modules: batch statistics need the full grouped tensor).

Replaces, per scale, the composition of reference CUDA GroupPoint +
conv2d MLP + max pooling (lib/utils/layers_util.py:152-181).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_U = 16  # gathered rows per unrolled loop body (one aligned [U, c] store)


def _kernel(ns: int, tm: int, cf: int, n_layers: int,
            idx_ref, src_ref, ctr_ref, *refs):
    """idx_ref: [TM*ns] int32 SMEM; src_ref: [1, n, cp] VMEM (cp = cf + 3,
    features then xyz); ctr_ref: [1, TM, 3]; refs: per layer (w [ci, co]
    bf16, b [1, co] bf16, inv [1, co] f32, shift [1, co] f32), then the
    output ref [1, TM, c_out], then the [TM*ns, cp] gather scratch."""
    out_ref = refs[4 * n_layers]
    g_ref = refs[4 * n_layers + 1]
    rows = tm * ns

    def body(r, carry):
        gathered = [
            src_ref[0, pl.ds(idx_ref[r * _U + u], 1), :] for u in range(_U)
        ]
        g_ref[pl.ds(r * _U, _U), :] = jnp.concatenate(gathered, axis=0)
        return carry

    lax.fori_loop(0, rows // _U, body, 0)

    x = g_ref[:]  # [rows, cp]
    ctr = ctr_ref[0]  # [TM, 3]
    ctr_rows = jnp.broadcast_to(
        ctr[:, None, :], (tm, ns, 3)
    ).reshape(rows, 3)
    x = jnp.concatenate([x[:, :cf], x[:, cf:] - ctr_rows], axis=-1)

    for i in range(n_layers):
        w = refs[4 * i][:]
        b = refs[4 * i + 1][0]
        inv = refs[4 * i + 2][0]
        shift = refs[4 * i + 3][0]
        y = jnp.dot(
            x.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + b[None, :]
        x = jnp.maximum(y.astype(jnp.float32) * inv[None, :] + shift[None, :],
                        0.0)

    c_out = x.shape[-1]
    out_ref[0] = jnp.max(x.reshape(tm, ns, c_out), axis=1)


@functools.partial(jax.jit, static_argnums=(4,))
def _sa_fused_raw(src: Array, idx: Array, centers: Array, layers, dims):
    ns, tm, cf, n_layers = dims
    b, n, cp = src.shape
    m = idx.shape[1]
    mt = m // tm
    idx_flat = idx.astype(jnp.int32).reshape(b * mt * tm * ns)
    c_out = layers[-1][0].shape[1]

    layer_ins = []
    layer_specs = []
    for (w, bb, inv, shift) in layers:
        layer_ins += [
            w.astype(jnp.bfloat16),
            bb.astype(jnp.bfloat16).reshape(1, -1),
            inv.astype(jnp.float32).reshape(1, -1),
            shift.astype(jnp.float32).reshape(1, -1),
        ]
        layer_specs += [
            pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(_kernel, ns, tm, cf, n_layers)
    out = pl.pallas_call(
        kernel,
        grid=(b, mt),
        in_specs=[
            pl.BlockSpec((tm * ns,), lambda i, j, mt=mt: (i * mt + j,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ] + layer_specs,
        out_specs=pl.BlockSpec((1, tm, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm * ns, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(idx_flat, src.astype(jnp.float32), centers.astype(jnp.float32),
      *layer_ins)
    return out


def supports(src: Array, ns: int, m: int) -> bool:
    """Envelope: f32 source cloud VMEM-resident (lane-padded), row count per
    tile a multiple of the unroll, query count tileable."""
    b, n, cp = src.shape
    lanes = -(-cp // 128) * 128
    return (
        src.dtype == jnp.float32
        and n % 8 == 0
        and n * lanes * 4 <= 12 * 1024 * 1024
        and m % 8 == 0
        and (m * ns) % _U == 0
    )


def sa_fused_pallas(src: Array, idx: Array, centers: Array, layers) -> Array:
    """src: [b, n, cf+3] f32, rows = (features | xyz); idx: int32 [b, m, ns]
    (pre-masked: empty balls point at row 0); centers: [b, m, 3];
    layers: sequence of (kernel [ci, co] f32, bias [co], inv [co],
    shift [co]) — BN already folded to an affine.

    Returns the pooled [b, m, c_out] f32 features (unmasked; callers zero
    empty balls, as the unfused path does)."""
    b, m, ns = idx.shape
    cf = src.shape[-1] - 3
    tm = max(8, min(m, 4096 // ns))
    while m % tm:
        tm //= 2
    assert tm >= 8 and (tm * ns) % _U == 0, (m, ns, tm)
    return _sa_fused_raw(
        src, idx, centers, tuple(layers), (ns, tm, cf, len(layers))
    )
