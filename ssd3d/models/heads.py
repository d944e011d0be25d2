"""Prediction heads (reference lib/utils/head_util.py + modeling/head_builder.py).

Head tuples from the config (reference config.py:241-250):
    0: xyz source layers, 1: feature source layers, 2: op type,
    3: mlp list, 4: bn, 5: head type ('Det' | 'IoU'), 6: scope

Channel bookkeeping (head_builder.py:34-58):
    cls channels  = num_anchors (sigmoid) | num_anchors + 1 (softmax)
    reg base      = num_anchors (anchor-based) | 1 (anchor-free)
    reg channels  = 6 (Dist/Log/Dist-free) | 4*bins + 4 (Bin)
    angle bins    = ANGLE_CLS_NUM logits + ANGLE_CLS_NUM residuals
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssd3d.nn.layers import PointConv, SharedMLP

Array = jax.Array


class DetectionHead(nn.Module):
    """Box regression head: shared MLP trunk, then cls / reg (+ attr/velo)
    branches, each 128 -> out (head_util.py:26-59)."""

    mlp: Sequence[int]
    cls_channels: int
    reg_base: int  # anchors per point (1 in anchor-free mode)
    reg_channels: int  # per-base box channels, excluding angle bins
    num_angle_cls: int
    bn: bool = True
    predict_attr_velo: bool = False
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features: Array, train: bool, bn_momentum=0.9) -> dict:
        """features: [bs, n, c] -> dict of per-point predictions."""
        x = SharedMLP(
            tuple(self.mlp), bn=self.bn, use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="trunk",
        )(features, train, bn_momentum)

        cls = PointConv(128, bn=self.bn, use_gn=self.use_gn,
                        axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="pred_cls_base")(
            x, train, bn_momentum)
        cls = PointConv(self.cls_channels, bn=False, activation=False,
                        name="pred_cls")(cls, train, bn_momentum)

        reg_out = self.reg_base * (self.reg_channels + self.num_angle_cls * 2)
        reg = PointConv(128, bn=self.bn, use_gn=self.use_gn,
                        axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="pred_reg_base")(
            x, train, bn_momentum)
        reg = PointConv(reg_out, bn=False, activation=False, name="pred_reg")(
            reg, train, bn_momentum)
        bs, n = reg.shape[:2]
        reg = reg.reshape(bs, n, self.reg_base,
                          self.reg_channels + self.num_angle_cls * 2)

        out = {
            "feature": x,
            "cls": cls,  # [bs, n, cls_channels]
            "offset": reg[..., : self.reg_channels],
            "angle_cls": reg[..., self.reg_channels:
                             self.reg_channels + self.num_angle_cls],
            "angle_res": reg[..., self.reg_channels + self.num_angle_cls:],
        }
        if self.predict_attr_velo:
            attr = PointConv(128, bn=self.bn, use_gn=self.use_gn,
                             axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="pred_attr_base")(
                x, train, bn_momentum)
            attr = PointConv(self.reg_base * 8, bn=False, activation=False,
                             name="pred_attr")(attr, train, bn_momentum)
            velo = PointConv(128, bn=self.bn, use_gn=self.use_gn,
                             axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="pred_velo_base")(
                x, train, bn_momentum)
            velo = PointConv(self.reg_base * 2, bn=False, activation=False,
                             name="pred_velo")(velo, train, bn_momentum)
            out["attribute"] = attr.reshape(bs, n, self.reg_base, 8)
            out["velocity"] = velo.reshape(bs, n, self.reg_base, 2)
        return out


class IoUHead(nn.Module):
    """IoU-prediction branch (sparse-to-dense rescoring; head_util.py:62)."""

    mlp: Sequence[int]
    cls_channels: int
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features: Array, train: bool, bn_momentum=0.9) -> Array:
        x = SharedMLP(
            tuple(self.mlp), bn=self.bn, use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="trunk",
        )(features, train, bn_momentum)
        x = PointConv(128, bn=self.bn, use_gn=self.use_gn,
                      axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="pred_iou_base")(
            x, train, bn_momentum)
        return PointConv(self.cls_channels, bn=False, activation=False,
                         name="pred_iou")(x, train, bn_momentum)
