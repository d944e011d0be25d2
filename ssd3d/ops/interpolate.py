"""Feature interpolation ops (PointRCNN FP layers).

Replaces the reference CUDA/C++ interpolation op family
(lib/utils/tf_ops/interpolation/): `three_nn` returns SQUARED distances to the
3 nearest known points (tf_interpolate_g.cu:24 comment "with square
distance"); `three_interpolate` is an inverse-distance weighted gather whose
gradient XLA derives automatically (the CUDA build hand-writes the
scatter-add)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def three_nn(xyz1: Array, xyz2: Array, use_pallas: bool = True):
    """3 nearest known points for each unknown point.

    xyz1 (unknown): [b, n, 3]; xyz2 (known): [b, m, 3]
    -> (dist2 [b, n, 3], idx int32 [b, n, 3]).

    On TPU this dispatches to the Pallas kernel (ops/pallas/three_nn.py):
    the [tq, m] distance tile lives only in VMEM and the three min passes
    run back-to-back — the XLA path below re-reads an HBM tile per pass.
    Inputs are stop_gradient'ed on that path, matching the reference op's
    missing gradient registration (tf_interpolate.py registers grads only
    for ThreeInterpolate; xyz is a non-parameter leaf at every call site)."""
    if use_pallas and jax.default_backend() == "tpu":
        m = xyz2.shape[1]
        if xyz1.shape[1] >= 8 and 8 <= m <= 16384:
            from ssd3d.ops.pallas.three_nn import three_nn_pallas

            return three_nn_pallas(
                jax.lax.stop_gradient(xyz1), jax.lax.stop_gradient(xyz2)
            )
    return _three_nn_jnp(xyz1, xyz2)


@jax.jit
def _three_nn_jnp(xyz1: Array, xyz2: Array):
    """Plain-XLA three_nn (CPU path and the Pallas kernel's oracle).

    k=3 is found by three masked min/argmin passes instead of top_k —
    lax.top_k lowers to a full per-row sort on TPU. Tie order matches the
    CUDA scan (tf_interpolate_g.cu:24): equal distances fill slots in index
    order (argmin takes the first occurrence, the mask advances past it)."""

    def per_cloud(unknown, known):
        m = known.shape[0]
        iota = jnp.arange(m, dtype=jnp.int32)

        def one(q_chunk):
            d2 = jnp.sum(
                (q_chunk[:, None, :] - known[None, :, :]) ** 2, axis=-1
            )
            vals, idxs = [], []
            work = d2
            for _ in range(3):
                i = jnp.argmin(work, axis=-1).astype(jnp.int32)
                v = jnp.min(work, axis=-1)
                idxs.append(i)
                vals.append(v)
                work = jnp.where(iota[None, :] == i[:, None], jnp.inf, work)
            return jnp.stack(vals, -1), jnp.stack(idxs, -1)

        n = unknown.shape[0]
        chunk = min(1024, n)
        pad = (-n) % chunk
        q = jnp.pad(unknown, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
        d, i = jax.lax.map(one, q)
        return d.reshape(-1, 3)[:n], i.reshape(-1, 3)[:n]

    return jax.vmap(per_cloud)(xyz1, xyz2)


def three_interpolate(points: Array, idx: Array, weight: Array) -> Array:
    """points: [b, m, c]; idx: [b, n, 3]; weight: [b, n, 3] -> [b, n, c]."""
    return k_interpolate(points, idx, weight)


def k_interpolate(points: Array, idx: Array, weight: Array) -> Array:
    """General-k weighted gather (reference KInterpolate)."""
    b, n, k = idx.shape
    flat = idx.reshape(b, n * k)
    gathered = jnp.take_along_axis(points, flat[..., None], axis=1)
    gathered = gathered.reshape(b, n, k, points.shape[-1])
    return jnp.sum(gathered * weight[..., None], axis=2)


@functools.partial(jax.jit, static_argnums=())
def inverse_distance_weights(dist2: Array, eps: float = 1e-10) -> Array:
    """Normalized 1/d weights from three_nn squared distances
    (reference layers_util.py:206-210 uses 1/dist of the op's output)."""
    d = jnp.maximum(dist2, eps)
    inv = 1.0 / d
    return inv / jnp.sum(inv, axis=-1, keepdims=True)
