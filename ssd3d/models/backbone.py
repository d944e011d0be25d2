"""Config-driven point backbone.

Interprets the reference's 16-field architecture tuples (one per layer;
schema documented at reference config.py:207-239 and preserved verbatim so
shipped YAMLs drive this backbone unchanged):

    0: xyz source layer indices        8: fps npoint list
    1: feature source layer indices    9: former_fps_idx source layer (-1: none)
    2: radius list                    10: use_attention
    3: nsample list                   11: layer type (SA_Layer | Vote_Layer |
    4: mlp list                           FP_Layer | SA_Layer_SSG_Last)
    5: bn                             12: scope (module name)
    6: fps sample range list          13: dilated_group
    7: fps method list                14: vote_ctr source layer (-1: none)
                                      15: aggregation channel

The layer graph is threaded through xyz/feature/fps-idx lists exactly like
the reference LayerBuilder (layer_builder.py:45-102): entry 0 is the raw
input; each layer appends its outputs; source indices refer into these lists.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssd3d.nn.modules import (
    PointnetFPModule,
    PointnetSAModuleGlobal,
    PointnetSAModuleMSG,
    VoteLayer,
)

Array = jax.Array


class PointBackbone(nn.Module):
    """Stack of SA / Vote / FP layers described by architecture tuples."""

    architecture: Sequence[Sequence[Any]]
    max_translate_range: Sequence[float]
    aggregation_sa_feature: bool = False
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None
    # rematerialize each layer's activations in the backward pass (MODEL.REMAT)
    # — trades recompute for HBM so deep stacks (end-to-end two-stage
    # training) fit; the reference never needed this because TF1 towers
    # recompute per-GPU at much smaller batch.
    remat: bool = False

    @nn.compact
    def __call__(self, points: Array, train: bool, bn_momentum: Array | float = 0.9,
                 prefix_xyz: tuple = (), prefix_features: tuple = ()):
        """points: [bs, n, 3 + c] -> dict with xyz/feature/fps lists and vote
        outputs (vote base + raw offsets, for the vote loss).

        prefix_xyz/prefix_features: entries inserted BEFORE the raw input in
        the layer-graph lists — the two-stage detector seeds the RCNN stack
        with the proposal centers this way (double_stage_detector.py:210)."""
        xyz_list: list = list(prefix_xyz) + [points[..., 0:3]]
        feature_list: list = list(prefix_features) + [points[..., 3:]]
        fps_idx_list: list = [None] * (len(prefix_xyz) + 1)
        vote_base, vote_offset = [], []

        # TF variable scopes may repeat across layers (the shipped 3DSSD YAML
        # names both the gather-only SA layer and the Vote_Layer "vote");
        # flax module names must be unique.
        used_names: set = set()

        # `train` drives python control flow (BN mode) -> static under remat
        if self.remat:
            SAModuleMSG = nn.remat(
                PointnetSAModuleMSG, static_argnums=(5,), prevent_cse=False)
            Vote = nn.remat(VoteLayer, static_argnums=(3,), prevent_cse=False)
            FPModule = nn.remat(
                PointnetFPModule, static_argnums=(5,), prevent_cse=False)
            SAGlobal = nn.remat(
                PointnetSAModuleGlobal, static_argnums=(3,), prevent_cse=False)
        else:
            SAModuleMSG, Vote = PointnetSAModuleMSG, VoteLayer
            FPModule, SAGlobal = PointnetFPModule, PointnetSAModuleGlobal

        for layer_i, spec in enumerate(self.architecture):
            (
                xyz_idx, feat_idx, radius_list, nsample_list, mlp_list, bn,
                fps_range_list, fps_method_list, npoint_list, former_fps_from,
                use_attention, layer_type, scope, dilated, vote_ctr_from,
                agg_channel,
            ) = spec

            scope = scope if scope and scope not in used_names else (
                f"{scope or 'layer'}_{layer_i}"
            )
            used_names.add(scope)

            xyz_in = [xyz_list[i] for i in xyz_idx]
            feat_in = [feature_list[i] for i in feat_idx]
            former_fps_idx = (
                fps_idx_list[former_fps_from] if former_fps_from != -1 else None
            )
            vote_ctr = xyz_list[vote_ctr_from] if vote_ctr_from != -1 else None

            if layer_type == "SA_Layer":
                new_xyz, new_feat, new_fps_idx = SAModuleMSG(
                    radius_list=tuple(radius_list),
                    nsample_list=tuple(nsample_list),
                    mlp_list=tuple(tuple(m) for m in mlp_list),
                    bn=bn,
                    fps_sample_range_list=tuple(fps_range_list),
                    fps_method_list=tuple(fps_method_list),
                    npoint_list=tuple(npoint_list),
                    use_attention=use_attention,
                    dilated_group=dilated,
                    aggregation_channel=agg_channel if agg_channel != -1 else None,
                    aggregate=self.aggregation_sa_feature,
                    use_gn=self.use_gn,
                    axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                    name=scope,
                )(xyz_in[0], feat_in[0], former_fps_idx, vote_ctr, train, bn_momentum)
                xyz_list.append(new_xyz)
                feature_list.append(new_feat)
                fps_idx_list.append(new_fps_idx)

            elif layer_type == "Vote_Layer":
                new_xyz, new_feat, offsets = Vote(
                    mlp=tuple(mlp_list),
                    max_translate_range=tuple(self.max_translate_range),
                    bn=bn,
                    use_gn=self.use_gn,
                    axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                    name=scope,
                )(xyz_in[0], feat_in[0], train, bn_momentum)
                vote_base.append(xyz_in[0])
                vote_offset.append(offsets)
                xyz_list.append(new_xyz)
                feature_list.append(new_feat)
                fps_idx_list.append(None)

            elif layer_type == "FP_Layer":
                new_feat = FPModule(
                    mlp=tuple(mlp_list),
                    bn=bn,
                    use_gn=self.use_gn,
                    axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                    name=scope,
                )(xyz_in[0], xyz_in[1], feat_in[0], feat_in[1], train, bn_momentum)
                xyz_list.append(xyz_in[0])
                feature_list.append(new_feat)
                fps_idx_list.append(None)

            elif layer_type == "SA_Layer_SSG_Last":
                new_feat = SAGlobal(
                    mlp=tuple(mlp_list),
                    bn=bn,
                    use_gn=self.use_gn,
                    axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                    name=scope,
                )(xyz_in[0], feat_in[0], train, bn_momentum)
                xyz_list.append(None)
                feature_list.append(new_feat)
                fps_idx_list.append(None)

            else:
                raise ValueError(f"unknown layer type {layer_type}")

        return {
            "xyz": xyz_list,
            "features": feature_list,
            "fps_idx": fps_idx_list,
            "vote_base": vote_base,
            "vote_offset": vote_offset,
        }
