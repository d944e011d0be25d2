"""PointNet++-family network modules, config-driven.

These are the TPU-native equivalents of the reference's network blocks
(lib/utils/layers_util.py):

- `PointnetSAModuleMSG`  <- pointnet_sa_module_msg (layers_util.py:59-189):
  multi-segment fusion sampling (D-FPS / F-FPS / FS), dilated or attention
  grouping, per-radius grouped MLP + maxpool, optional aggregation conv, and
  the radius-less gather-only fallback used by 3DSSD's pre-vote layer.
- `VoteLayer`            <- vote_layer (layers_util.py:12-24): candidate
  generation shift with clipped offsets.
- `PointnetFPModule`     <- pointnet_fp_module (layers_util.py:192-224):
  3-NN inverse-distance feature upsampling (PointRCNN decoder).
- `PointnetSAModuleGlobal` <- pointnet_sa_module (layers_util.py:27-55).

All sampling/grouping calls are the fixed-shape ops from ssd3d.ops, so the
whole backbone is one jit-compiled program; the per-radius MLPs see dense
[bs, npoint, nsample, c] blocks that XLA tiles onto the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssd3d.nn.layers import PointConv, SharedMLP
from ssd3d.ops.grouping import (
    ball_query_attention,
    ball_query_multi,
    group_points,
)
from ssd3d.ops.interpolate import inverse_distance_weights, three_interpolate, three_nn
from ssd3d.ops.sampling import (
    farthest_point_sample,
    farthest_point_sample_features,
    gather_points,
)

Array = jax.Array


def _fusion_sample(
    xyz: Array,
    features: Array,
    fps_sample_range_list: Sequence[int],
    fps_method_list: Sequence[str],
    npoint_list: Sequence[int],
) -> Array:
    """Multi-segment fusion sampling (layers_util.py:82-111).

    The point axis is partitioned into consecutive segments (a range of -1
    means "to the end"); each segment is sampled with its own method:
    D-FPS (xyz metric), F-FPS (feature+xyz metric), or FS (both, indices
    concatenated). Returns concatenated indices into the ORIGINAL point axis.
    """
    n = xyz.shape[1]
    bs = xyz.shape[0]
    idx_parts = []
    start = 0
    for rng, method, npoint in zip(fps_sample_range_list, fps_method_list, npoint_list):
        length = (n - start) if rng == -1 else rng
        if npoint == 0:
            start += length
            continue
        seg_xyz = jax.lax.slice_in_dim(xyz, start, start + length, axis=1)
        if npoint == length and method != "FS":
            idx = jnp.broadcast_to(
                jnp.arange(npoint, dtype=jnp.int32)[None], (bs, npoint)
            )
        elif method == "D-FPS":
            idx = farthest_point_sample(seg_xyz, npoint)
        elif method == "F-FPS":
            seg_feat = jax.lax.slice_in_dim(features, start, start + length, axis=1)
            fused = jnp.concatenate([seg_xyz, seg_feat], axis=-1)
            idx = farthest_point_sample_features(fused, npoint)
        elif method == "FS":
            seg_feat = jax.lax.slice_in_dim(features, start, start + length, axis=1)
            fused = jnp.concatenate([seg_xyz, seg_feat], axis=-1)
            idx_f = farthest_point_sample_features(fused, npoint)
            idx_d = farthest_point_sample(seg_xyz, npoint)
            idx = jnp.concatenate([idx_f, idx_d], axis=-1)
        else:
            raise ValueError(f"unknown fps method {method}")
        idx_parts.append(idx + start)
        start += length
    return jnp.concatenate(idx_parts, axis=-1)


class PointnetSAModuleMSG(nn.Module):
    """Set abstraction with multi-scale grouping + fusion sampling.

    Attributes map 1:1 onto the reference's 16-field architecture tuple
    (reference config.py:207-239); see ssd3d/models/backbone.py for the
    wiring of xyz/feature/fps-idx lists.
    """

    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    bn: bool
    fps_sample_range_list: Sequence[int]
    fps_method_list: Sequence[str]
    npoint_list: Sequence[int]
    use_attention: bool
    dilated_group: bool
    aggregation_channel: int | None
    aggregate: bool = True  # cfg.MODEL.NETWORK.AGGREGATION_SA_FEATURE
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    def _use_fused(self, train: bool, packed_src: Array, idx: Array) -> bool:
        """Fused SA kernel dispatch: inference, plain BatchNorm, TPU, and
        shapes inside the kernel's VMEM envelope.

        Default ON for the RoI regime — many small clouds (n <= 512,
        b >= 64: the RCNN stage runs batch x proposals = hundreds of
        512-point RoIs), where the unfused path's HBM materialization of
        the grouped tensor dominates the two-stage step (92 of 153 ms at
        batch 4, benchmarks/trace_two_stage_b4.json). Default OFF for the
        flagship regime (few big clouds): chip-measured in round 2 as a
        NET LOSS there (121.7 vs 150.9 scans/s — the serial in-kernel
        gather starves the MXU while the unfused pipeline overlaps);
        SSD3D_ENABLE_FUSED_SA=1 force-enables everywhere for experiments.
        The dots follow compute_dtype (bf16, or f32 at HIGHEST)."""
        import os

        from ssd3d.ops.pallas import sa_fused

        b, n, _ = packed_src.shape
        # under jax.export with a symbolic batch dim, b is a _DimExpr and
        # any comparison raises InconclusiveDimensionOperation — symbolic
        # shapes take the unfused path (caught by the symbolic-batch
        # export test)
        if not (isinstance(b, int) and isinstance(n, int)):
            return False
        roi_regime = n <= 512 and b >= 64
        return (
            not train
            and self.bn
            and not self.use_gn
            and (roi_regime or bool(os.environ.get("SSD3D_ENABLE_FUSED_SA")))
            and jax.default_backend() == "tpu"
            and sa_fused.supports(packed_src, idx.shape[2], idx.shape[1])
        )

    @nn.compact
    def __call__(
        self,
        xyz: Array,
        features: Array,
        former_fps_idx: Array | None,
        vote_ctr: Array | None,
        train: bool,
        bn_momentum: Array | float = 0.9,
    ):
        bs = xyz.shape[0]

        if vote_ctr is not None:
            # CG layer: centers are the vote outputs, not FPS picks
            npoint = vote_ctr.shape[1]
            fps_idx = jnp.broadcast_to(
                jnp.arange(npoint, dtype=jnp.int32)[None], (bs, npoint)
            )
        else:
            fps_idx = _fusion_sample(
                xyz,
                features,
                self.fps_sample_range_list,
                self.fps_method_list,
                self.npoint_list,
            )

        if former_fps_idx is not None:
            fps_idx = jnp.concatenate([fps_idx, former_fps_idx], axis=-1)

        if vote_ctr is not None:
            new_xyz = gather_points(vote_ctr, fps_idx)
        else:
            new_xyz = gather_points(xyz, fps_idx)

        if len(self.radius_list) == 0:
            # radius-less fallback: pure gather (3DSSD pre-vote selection,
            # layers_util.py:186-187)
            return new_xyz, gather_points(features, fps_idx), fps_idx

        # ---- grouping: all radius scales in one distance pass
        if self.use_attention:
            # the ball fills with the most feature-distant in-radius points
            # first (layers_util.py:122-130). ball_query_attention emits the
            # same multiset as the reference's sorted visitation WITHOUT the
            # per-query argsort (a full 16k sort per query on TPU — the
            # measured 500x cliff); see ops/grouping.py.
            new_feat = gather_points(features, fps_idx)
            queries = [
                ball_query_attention(r, ns, xyz, new_xyz, features, new_feat)
                for r, ns in zip(self.radius_list, self.nsample_list)
            ]
        else:
            queries = ball_query_multi(
                list(self.radius_list),
                list(self.nsample_list),
                xyz,
                new_xyz,
                dilated=self.dilated_group,
            )

        # one packed gather per scale instead of separate xyz/feature gathers
        # (TPU row gathers are element-rate-limited; see gather_bench)
        packed_src = jnp.concatenate([features, xyz], axis=-1)
        mlps = [
            SharedMLP(
                tuple(self.mlp_list[i]),
                bn=self.bn,
                use_gn=self.use_gn,
                axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                name=f"mlp{i}",
            )
            for i in range(len(queries))
        ]
        aggregating = self.aggregate and self.aggregation_channel is not None
        agg_conv = (
            PointConv(
                self.aggregation_channel,
                bn=self.bn,
                use_gn=self.use_gn,
                axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                name="aggregation",
            )
            if aggregating
            else None
        )

        if all(self._use_fused(train, packed_src, idx) for idx, _ in queries):
            # inference: the WHOLE layer — every scale's gather +
            # center-subtract + MLP (BN folded) + masked max-pool, plus the
            # aggregation conv — is one Pallas kernel; grouped tensors
            # never exist in HBM (ops/pallas/sa_fused.py)
            from ssd3d.ops.pallas.sa_fused import sa_fused_multi

            idx_list, masks, folded_list = [], [], []
            for i, (idx, cnt) in enumerate(queries):
                has_pts = (cnt > 0).astype(jnp.int32)
                idx_list.append(idx * has_pts[..., None])
                masks.append(has_pts)
                folded_list.append(
                    mlps[i](packed_src, train, bn_momentum, fold=True)
                )
            agg_folded = None
            if aggregating:
                sum_c = sum(self.mlp_list[i][-1] for i in range(len(queries)))
                agg_folded = agg_conv(
                    jnp.zeros((1, sum_c), jnp.float32), train, bn_momentum,
                    fold=True,
                )
            new_features = sa_fused_multi(
                jax.lax.stop_gradient(packed_src),
                idx_list,
                jax.lax.stop_gradient(new_xyz),
                jnp.stack(masks, axis=-1).astype(jnp.float32),
                folded_list,
                agg_folded,
                dots_bf16=self.compute_dtype == jnp.bfloat16,
            )
            return new_xyz, new_features, fps_idx

        scale_feats = []
        for i, (idx, cnt) in enumerate(queries):
            has_pts = (cnt > 0).astype(jnp.int32)  # [bs, npoint]
            idx = idx * has_pts[..., None]  # empty balls -> gather point 0
            grouped = group_points(packed_src, idx)
            grouped_xyz = grouped[..., -3:] - new_xyz[:, :, None, :]
            grouped = jnp.concatenate(
                [grouped[..., :-3], grouped_xyz], axis=-1
            )
            grouped = mlps[i](grouped, train, bn_momentum)
            pooled = jnp.max(grouped, axis=2)  # [bs, npoint, c]
            pooled = pooled * has_pts[..., None].astype(pooled.dtype)
            scale_feats.append(pooled)

        new_features = jnp.concatenate(scale_feats, axis=-1)
        if aggregating:
            new_features = agg_conv(new_features, train, bn_momentum)
        return new_xyz, new_features, fps_idx


class VoteLayer(nn.Module):
    """Candidate-generation shift (3DSSD CG layer; layers_util.py:12-24).

    Returns (shifted_xyz, features, raw_offsets); the shift applied to xyz is
    clipped to max_translate_range, but the RAW offsets feed the vote loss.
    """

    mlp: Sequence[int]
    max_translate_range: Sequence[float]
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, xyz, features, train, bn_momentum=0.9):
        x = SharedMLP(
            tuple(self.mlp),
            bn=self.bn,
            use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            name="mlp",
        )(features, train, bn_momentum)
        offsets = PointConv(3, bn=False, activation=False, name="vote_offsets")(
            x, train, bn_momentum
        )
        limit = jnp.asarray(self.max_translate_range, jnp.float32).reshape(1, 1, 3)
        limited = jnp.clip(offsets, jnp.minimum(limit, -limit), jnp.abs(limit))
        return xyz + limited, x, offsets


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""

    mlp: Sequence[int]
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, xyz1, xyz2, feat1, feat2, train, bn_momentum=0.9):
        """xyz1: dense points [bs, n, 3]; xyz2: sparse [bs, m, 3];
        feat1: [bs, n, c1] or None; feat2: [bs, m, c2]."""
        dist2, idx = three_nn(xyz1, xyz2)
        weight = inverse_distance_weights(dist2)
        interp = three_interpolate(feat2, idx, weight)
        if feat1 is not None:
            interp = jnp.concatenate([interp, feat1], axis=-1)
        return SharedMLP(
            tuple(self.mlp),
            bn=self.bn,
            use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            name="mlp",
        )(interp, train, bn_momentum)


class PointnetSAModuleGlobal(nn.Module):
    """Global SSG pooling: pointwise MLP over concat(xyz, feat), max over
    all points (layers_util.py:27-55)."""

    mlp: Sequence[int]
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, xyz, features, train, bn_momentum=0.9):
        x = jnp.concatenate([xyz, features], axis=-1)
        x = SharedMLP(
            tuple(self.mlp),
            bn=self.bn,
            use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            name="mlp",
        )(x, train, bn_momentum)
        return jnp.max(x, axis=1)
