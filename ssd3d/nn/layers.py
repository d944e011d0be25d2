"""Basic network layers.

All "convolutions" in this model family are 1×1 (pointwise) — reference
tf_util.conv1d/conv2d with kernel 1 — i.e. plain matmuls over the channel
axis. On TPU they are written as Dense layers so XLA maps them straight onto
the MXU and fuses the BN/ReLU epilogues.

BatchNorm is hand-rolled (not nn.BatchNorm) because the reference schedules
the moving-average decay over training (trainer_utils.py:15 get_bn_decay) —
momentum must be a *call argument*, not a module attribute. Cross-device
statistics sync (the reference's NCCL SyncBN, sync_bn.py:56) falls out of a
single `lax.pmean` when `axis_name` is set — on TPU this rides the ICI.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class BatchNorm(nn.Module):
    """Batch normalization over all axes but the last, with schedulable
    momentum and optional cross-device sync.

    Running statistics live in the 'batch_stats' collection.
    """

    epsilon: float = 1e-3  # tf.contrib.layers.batch_norm default
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool, momentum: Array | float = 0.9,
                 fold: bool = False):
        x = x.astype(jnp.float32)  # stats and affine in f32 always
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if fold:
            # eval-mode BN as an affine: y = x * inv + shift (for kernels
            # that fuse the conv + BN + ReLU chain; x only supplies c)
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return inv, bias - ra_mean.value * inv

        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(x), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return x * inv + (bias - mean * inv)


class _DenseParams(nn.Module):
    """Creates (and returns) a Dense layer's kernel/bias as VALUES, at the
    same scope path ("<name>/kernel", "<name>/bias") nn.Dense would use —
    so the owning PointConv can either apply them inline (identical math to
    nn.Dense) or hand them to a fused Pallas kernel."""

    c_in: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (self.c_in, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def _dense_apply(x: Array, k: Array, b: Array, dtype: Any) -> Array:
    """nn.Dense's computation, verbatim: promote to `dtype`, contract the
    last axis, add bias."""
    if dtype is not None:
        x, k, b = x.astype(dtype), k.astype(dtype), b.astype(dtype)
    y = jax.lax.dot_general(
        x, k, (((x.ndim - 1,), (0,)), ((), ()))
    )
    return y + jnp.reshape(b, (1,) * (y.ndim - 1) + (-1,))


class PointConv(nn.Module):
    """1×1 conv (Dense) + optional BN/GN + ReLU — the reference's
    tf_util.conv1d/conv2d with kernel size 1 (tf_util.py:51/:127).

    With fold=True (eval-only, bn and activation required), returns the
    layer as data instead of applying it: (kernel, bias, inv, shift) with
    BN reduced to an affine — consumed by the fused SA grouping kernel
    (ssd3d/ops/pallas/sa_fused.py). `x` then only supplies the input width.
    """

    channels: int
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    activation: bool = True
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for MXU-friendly matmuls

    @nn.compact
    def __call__(self, x: Array, train: bool, bn_momentum: Array | float = 0.9,
                 fold: bool = False):
        k, b = _DenseParams(x.shape[-1], self.channels, name="conv")()
        if fold:
            assert self.bn and not self.use_gn and self.activation and not train
            inv, shift = BatchNorm(axis_name=self.axis_name, name="bn")(
                jnp.zeros((1, self.channels), jnp.float32),
                False, bn_momentum, fold=True,
            )
            return k, b, inv, shift
        x = _dense_apply(x, k, b, self.compute_dtype)
        if self.bn and self.use_gn:
            x = nn.GroupNorm(num_groups=min(32, self.channels), name="gn")(x)
        elif self.bn:
            x = BatchNorm(axis_name=self.axis_name, name="bn")(
                x, train, bn_momentum
            )
        if self.activation:
            x = nn.relu(x)
        return x


class SharedMLP(nn.Module):
    """Stack of PointConv blocks applied pointwise."""

    channels: Sequence[int]
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool, bn_momentum: Array | float = 0.9,
                 fold: bool = False):
        if fold:
            # return the whole stack as (kernel, bias, inv, shift) tuples
            # for the fused SA kernel; x only supplies the input width
            folded = []
            c = x.shape[-1]
            for i, ch in enumerate(self.channels):
                folded.append(
                    PointConv(
                        ch, bn=self.bn, use_gn=self.use_gn,
                        axis_name=self.axis_name,
                        compute_dtype=self.compute_dtype,
                        name=f"conv{i}",
                    )(jnp.zeros((1, c), jnp.float32), train, bn_momentum,
                      fold=True)
                )
                c = ch
            return folded
        for i, ch in enumerate(self.channels):
            x = PointConv(
                ch,
                bn=self.bn,
                use_gn=self.use_gn,
                axis_name=self.axis_name,
                compute_dtype=self.compute_dtype,
                name=f"conv{i}",
            )(x, train, bn_momentum)
        return x
