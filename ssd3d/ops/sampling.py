"""Point sampling ops: D-FPS, F-FPS, gathers.

TPU-native replacements for the reference CUDA sampling ops
(lib/utils/tf_ops/sampling/tf_sampling_g.cu):

- `farthest_point_sample` (D-FPS, kernel at tf_sampling_g.cu:124): iterative
  max-min over xyz. Inherently sequential in the number of samples; here a
  `lax.fori_loop` whose body is pure vector work (one [n]-sized distance
  update + argmax per step) that XLA keeps entirely on-chip. A fused Pallas
  kernel lives in ssd3d/ops/pallas/fps.py and is used automatically on TPU.
- `farthest_point_sample_from_dist` (F-FPS, tf_sampling_g.cu:181): same loop
  reading rows of a precomputed [n, n] distance matrix (the caller builds it
  with one MXU matmul — see geometry.square_distance).
- `gather_points` (tf_sampling_g.cu:320): plain take_along_axis; XLA's gather
  is differentiable, so no hand-written scatter-add gradient is needed.
- `gather_by_mask` (tf_sampling_g.cu:351): first `k` mask-true rows, padded by
  repeating the first selected row.

Semantics parity: index 0 is always the first FPS pick; argmax ties resolve to
the lowest index (measure-zero difference vs the CUDA tree reduction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample(xyz: Array, npoint: int, use_pallas: bool = True) -> Array:
    """D-FPS. xyz: [b, n, 3] -> int32 [b, npoint]."""
    # index selection is non-differentiable (the reference CUDA op has no
    # gradient); cutting tangents here also lets the Pallas kernel run under
    # jax.grad tracing
    xyz = jax.lax.stop_gradient(xyz)
    if use_pallas and jax.default_backend() == "tpu":
        from ssd3d.ops.pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint)
    return _fps_reference(xyz, npoint)


def _fps_reference(xyz: Array, npoint: int) -> Array:
    def single(pts: Array) -> Array:
        n = pts.shape[0]

        def body(i, state):
            min_dist, last, out = state
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            min_dist = jnp.minimum(min_dist, d)
            nxt = jnp.argmax(min_dist).astype(jnp.int32)
            return min_dist, nxt, out.at[i].set(nxt)

        out0 = jnp.zeros((npoint,), jnp.int32)  # pick 0 is always index 0
        dist0 = jnp.full((n,), jnp.inf, pts.dtype)
        _, _, out = jax.lax.fori_loop(
            1, npoint, body, (dist0, jnp.int32(0), out0)
        )
        return out

    return jax.vmap(single)(xyz)


@functools.partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample_from_dist(dist: Array, npoint: int,
                                    use_pallas: bool = True) -> Array:
    """F-FPS from a precomputed squared-distance matrix.

    dist: [b, n, n] -> int32 [b, npoint]."""
    dist = jax.lax.stop_gradient(dist)
    if (
        use_pallas
        and jax.default_backend() == "tpu"
        and dist.shape[1] % 8 == 0
        and dist.dtype == jnp.float32
    ):
        nbytes = dist.shape[0] * dist.shape[1] * dist.shape[2] * 4
        if nbytes <= 80 * 2**20:
            from ssd3d.ops.pallas.fps import ffps_pallas

            return ffps_pallas(dist, npoint)
        if dist.shape[0] <= 16 and (dist.shape[1] // 8) % 128 == 0:
            # too big for VMEM (e.g. the 4096-point fusion-sampling
            # segment): stream the picked rows from HBM instead (the
            # kernel's lane-sliced rows need n/8 % 128 == 0)
            from ssd3d.ops.pallas.fps import ffps_pallas_hbm

            return ffps_pallas_hbm(dist, npoint)

    def single(mat: Array) -> Array:
        n = mat.shape[0]

        def body(i, state):
            min_dist, last, out = state
            min_dist = jnp.minimum(min_dist, mat[last])
            nxt = jnp.argmax(min_dist).astype(jnp.int32)
            return min_dist, nxt, out.at[i].set(nxt)

        out0 = jnp.zeros((npoint,), jnp.int32)
        dist0 = jnp.full((n,), jnp.inf, mat.dtype)
        _, _, out = jax.lax.fori_loop(
            1, npoint, body, (dist0, jnp.int32(0), out0)
        )
        return out

    return jax.vmap(single)(dist)


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sample_features(fused: Array, npoint: int) -> Array:
    """F-FPS straight from the fused (xyz ++ feature) vectors.

    fused: [b, n, c] -> int32 [b, npoint]. Semantically identical to
    `farthest_point_sample_from_dist(square_distance(fused, fused), npoint)`
    but on TPU the pairwise matrix is produced DIRECTLY in the Pallas
    kernels' (8, n/8)-tiled shape: one einsum whose dot output layout is
    already the kernel input layout. Going through the [b, n, n] matrix
    instead costs a full-matrix layout-assignment copy between the dot and
    the kernel's bitcast view (measured 537 MB / ~5 ms per step on the
    flagship's 4096-point fusion-sampling segment, tools/dump_hlo.py)."""
    fused = jax.lax.stop_gradient(fused)
    b, n, c = fused.shape
    if jax.default_backend() == "tpu" and n % 8 == 0:
        f = fused.astype(jnp.float32)
        cols = n // 8
        sq = jnp.sum(f * f, axis=-1)  # [b, n]
        nbytes = b * n * n * 4
        # HIGH (bf16x3 passes, ~f32-grade error) not HIGHEST (bf16x6): the
        # x6 emulation lowers to a dilated-convolution emitter that measured
        # 121 ms standalone at the flagship 4096-segment vs 6.6 ms for x3,
        # and x3 keeps every F-FPS pick unique (the degeneracy that forced
        # precision control appears only at single-pass bf16)
        if nbytes <= 80 * 2**20:
            # d2[b, s, j, l] = |f_j - f_{s*cols+l}|^2 : the row-major n ->
            # (8, n/8) split matches _ffps_kernel's linear = s * cols + l
            # indexing, and the s-above-j output order is the layout the
            # TPU dot emitter prefers for this einsum shape — natural
            # {3,2,1,0}, hence copy-free into the VMEM kernel.
            ft = f.reshape(b, 8, cols, c)
            cross = jnp.einsum(
                "bnc,bskc->bsnk", f, ft,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )
            mat = (sq[:, None, :, None]
                   + sq.reshape(b, 8, cols)[:, :, None, :] - 2.0 * cross)
            from ssd3d.ops.pallas.fps import ffps_pallas_pre

            return ffps_pallas_pre(mat, npoint)
        if b <= 16 and n % 128 == 0:
            # The square matrix goes to the kernel EXACTLY as the dot
            # emits it ([b, p, t], t minor): _ffps_hbm_kernel streams the
            # contiguous row of each pick. Any view that splits the minor
            # axis re-tiles the buffer and costs a 537 MB/step relayout
            # copy (tools/dump_hlo.py).
            cross = jnp.einsum(
                "btc,bpc->bpt", f, f,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )
            mat = sq[:, :, None] + sq[:, None, :] - 2.0 * cross
            from ssd3d.ops.pallas.fps import ffps_pallas_hbm_rows

            return ffps_pallas_hbm_rows(mat, npoint)
    from ssd3d.core.geometry import square_distance

    return farthest_point_sample_from_dist(
        square_distance(fused, fused), npoint
    )


@functools.partial(jax.jit, static_argnums=(2,))
def farthest_point_sample_with_preidx(xyz: Array, preidx: Array,
                                      npoint: int) -> Array:
    """FPS seeded by prior picks: the distance field starts as the min
    distance to the preidx points (reference FarthestPointSampleWithPreidx,
    tf_sampling_g.cu:234 — unused by shipped configs, kept for parity).

    xyz: [b, n, 3]; preidx: int [b, m1] -> int32 [b, npoint]."""

    def single(pts, pre):
        n = pts.shape[0]
        seed_pts = jnp.take(pts, pre, axis=0)  # [m1, 3]
        d = jnp.min(
            jnp.sum((pts[:, None, :] - seed_pts[None, :, :]) ** 2, -1), axis=1
        )

        def body(i, state):
            min_dist, out = state
            nxt = jnp.argmax(min_dist).astype(jnp.int32)
            out = out.at[i].set(nxt)
            dd = jnp.sum((pts - pts[nxt]) ** 2, axis=-1)
            return jnp.minimum(min_dist, dd), out

        out0 = jnp.zeros((npoint,), jnp.int32)
        _, out = jax.lax.fori_loop(0, npoint, body, (d, out0))
        return out

    return jax.vmap(single)(xyz, preidx)


def prob_sample(weights: Array, rng: Array, num: int) -> Array:
    """Categorical sampling by weight (reference ProbSample legacy op,
    tf_sampling_g.cu:24). weights: [b, n] -> int32 [b, num]."""
    logits = jnp.log(jnp.maximum(weights, 1e-20))
    return jax.random.categorical(
        rng, logits[:, None, :], axis=-1,
        shape=(weights.shape[0], num),
    ).astype(jnp.int32)


def gather_points(points: Array, idx: Array) -> Array:
    """points: [b, n, c], idx: int [b, m] -> [b, m, c]."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


@functools.partial(jax.jit, static_argnums=(2,))
def gather_by_mask(points: Array, mask: Array, k: int) -> Array:
    """First `k` rows where mask is true, padded by repeating the first hit.

    points: [b, n, c]; mask: [b, n] (bool or 0/1) -> [b, k, c].
    Used by the two-stage detector to cut the RCNN minibatch out of the
    proposal set (reference sampler.py:41 + tf_sampling_g.cu:351)."""
    b, n, _ = points.shape
    mask = mask.astype(bool)
    iota = jnp.arange(n, dtype=jnp.int32)
    # stable order: mask-true rows first, original order preserved
    key = jnp.where(mask, iota, n + iota)
    order = jnp.argsort(key, axis=-1)[:, :k]  # [b, k]
    cnt = jnp.sum(mask, axis=-1, keepdims=True)  # [b, 1]
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]
    sel = jnp.where(slot < cnt, order, order[:, :1])
    return gather_points(points, sel)
