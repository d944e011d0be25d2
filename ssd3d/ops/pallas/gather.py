"""Pallas kernel: exact row gather via one-hot MXU matmuls.

XLA's row gather on TPU is element-rate-limited (~10 ns/element); the big
3DSSD grouping gathers (4.2M rows x 4 channels at layer 1) cost ~24 ms per
batch. This kernel keeps the source cloud resident in VMEM and fetches each
row with two dense steps: a one-hot [rows, n/128] MXU matmul pulls the
row's 128-wide block per channel, then a one-hot lane reduction picks the
element — no gather instruction anywhere.

Exactness: the one-hot operand is exactly representable, and the f32 source
operand is moved through the MXU with HIGHEST precision (the bf16x3
decomposition of f32 is exact, and multiplying by exactly 1.0 reconstructs
the original value), so outputs are bit-identical to take_along_axis. This
is asserted in the interpreter-mode parity test.

Used for low-channel sources (c <= 8); wide-channel gathers fall back to
XLA (the matmul cost scales with channels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_RT = 1024  # rows per grid step
_BS = 128  # block size


def _kernel(c: int, nb: int, idx_ref, src_ref, out_ref):
    """idx_ref: [1, 1, RT, 1] (rows on sublanes); src_ref: [1, c, nb, BS];
    out_ref: [1, RT, c]."""
    idx = idx_ref[0, 0]  # [RT, 1]
    blk = idx // _BS  # [RT, 1]
    off = idx % _BS

    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (_RT, nb), 1)
    onehot_blk = (blk_iota == blk).astype(jnp.float32)  # [RT, nb]
    off_iota = jax.lax.broadcasted_iota(jnp.int32, (_RT, _BS), 1)
    onehot_off = (off_iota == off).astype(jnp.float32)  # [RT, BS]

    cols = []
    for ci in range(c):
        src_c = src_ref[0, ci]  # [nb, BS]
        tmp = jax.lax.dot_general(
            onehot_blk, src_c,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [RT, BS] — the selected block's content, exact
        cols.append(jnp.sum(tmp * onehot_off, axis=1, keepdims=True))
    out_ref[0] = jnp.concatenate(cols, axis=1)  # [RT, c]


@jax.custom_vjp
def gather_rows_pallas(src: Array, idx: Array) -> Array:
    """src: [b, n, c] f32 (c <= 8, n % 128 == 0); idx: int32 [b, rows]
    -> [b, rows, c], bit-identical to take_along_axis. Differentiable wrt
    src via a scatter-add custom VJP (the CUDA GroupPointGrad contract)."""
    return _gather_rows_impl(src, idx)


def _gather_fwd(src, idx):
    return _gather_rows_impl(src, idx), (idx, src.shape)


def _gather_bwd(res, g):
    idx, shape = res
    b, n, c = shape
    dsrc = jnp.zeros(shape, g.dtype)
    dsrc = dsrc.at[
        jnp.arange(b, dtype=jnp.int32)[:, None], idx
    ].add(g)
    return dsrc, None


gather_rows_pallas.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.jit, static_argnums=())
def _gather_rows_impl(src: Array, idx: Array) -> Array:
    b, n, c = src.shape
    rows = idx.shape[1]
    nb = n // _BS
    pad = (-rows) % _RT
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, pad)))
    rt = (rows + pad) // _RT
    # rows-on-sublanes index layout: [b, rt, RT, 1] (a (1, rows) lane-major
    # block would violate Mosaic's 8x128 block rule)
    idx_p = idx_p.reshape(b, rt, _RT, 1)
    # channel-major blocked source: [b, c, nb, BS]
    src_t = jnp.transpose(src.astype(jnp.float32), (0, 2, 1)).reshape(
        b, c, nb, _BS
    )

    kernel = functools.partial(_kernel, c, nb)
    out = pl.pallas_call(
        kernel,
        grid=(b, rt),
        in_specs=[
            pl.BlockSpec((1, 1, _RT, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, nb, _BS), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _RT, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows + pad, c), jnp.float32),
    )(idx_p, src_t)
    return out[:, :rows]
