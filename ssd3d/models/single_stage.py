"""3DSSD single-stage detector (reference modeling/single_stage_detector.py).

The nn.Module covers the parametric graph (backbone + heads). Everything else
— anchor generation, decoding, NMS, target assignment, losses — is pure
functions over its outputs, so train and inference paths are thin jit-able
compositions instead of the reference's in-graph branching.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssd3d.core.box_coders import AnchorGenerator, BoxCoder
from ssd3d.core.geometry import boxes_to_bev_aabb
from ssd3d.models.backbone import PointBackbone
from ssd3d.models.heads import DetectionHead, IoUHead
from ssd3d.ops.nms import batched_class_nms

Array = jax.Array


class SingleStageDetector(nn.Module):
    """Backbone + prediction heads, config-driven."""

    architecture: Sequence[Sequence[Any]]
    head_cfg: Sequence[Sequence[Any]]
    max_translate_range: Sequence[float]
    num_classes: int
    num_angle_cls: int
    reg_base: int
    reg_channels: int
    cls_activation: str = "Sigmoid"
    predict_attr_velo: bool = False
    aggregation_sa_feature: bool = False
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, points: Array, train: bool, bn_momentum: Array | float = 0.9):
        """points: [bs, n, 3+c] -> dict of raw network outputs."""
        net = PointBackbone(
            architecture=self.architecture,
            max_translate_range=self.max_translate_range,
            aggregation_sa_feature=self.aggregation_sa_feature,
            use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            remat=self.remat,
            name="backbone",
        )(points, train, bn_momentum)

        cls_channels = (
            self.num_classes
            if self.cls_activation == "Sigmoid"
            else self.num_classes + 1
        )

        out: dict = {
            "vote_base": net["vote_base"],
            "vote_offset": net["vote_offset"],
        }
        det_xyz, det_preds, iou_preds = [], [], []
        for i, spec in enumerate(self.head_cfg):
            xyz_idx, feat_idx, op_type, mlp, bn, head_type, scope = spec
            xyz_in = jnp.concatenate([net["xyz"][j] for j in xyz_idx], axis=1)
            feat_in = jnp.concatenate([net["features"][j] for j in feat_idx], axis=1)
            name = scope if scope else f"head{i}"
            if head_type == "Det":
                preds = DetectionHead(
                    mlp=tuple(mlp),
                    cls_channels=cls_channels,
                    reg_base=self.reg_base,
                    reg_channels=self.reg_channels,
                    num_angle_cls=self.num_angle_cls,
                    bn=bn,
                    predict_attr_velo=self.predict_attr_velo,
                    use_gn=self.use_gn,
                    axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                    name=name,
                )(feat_in, train, bn_momentum)
                det_xyz.append(xyz_in)
                det_preds.append(preds)
            elif head_type == "IoU":
                iou_preds.append(
                    IoUHead(
                        mlp=tuple(mlp),
                        cls_channels=self.num_classes,
                        bn=bn,
                        use_gn=self.use_gn,
                        axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                        name=name,
                    )(feat_in, train, bn_momentum)
                )
            else:
                raise ValueError(f"unknown head type {head_type}")

        # merge multi-head outputs along the point axis
        # (reference model_util.py:229 merge_head_prediction)
        out["base_xyz"] = jnp.concatenate(det_xyz, axis=1)
        for key in ("feature", "cls", "offset", "angle_cls", "angle_res",
                    "attribute", "velocity"):
            vals = [p[key] for p in det_preds if key in p]
            if vals:
                out[key] = jnp.concatenate(vals, axis=1)
        if iou_preds:
            out["iou"] = jnp.concatenate(iou_preds, axis=1)
        return out


@dataclasses.dataclass(frozen=True)
class DetectorSpec:
    """Static, cfg-derived companion of the detector module: codecs, anchors,
    postprocessing parameters. Hashable so jitted fns can close over it."""

    cls_list: tuple
    coder: BoxCoder
    anchors: AnchorGenerator
    cls_activation: str
    max_output: int
    nms_threshold: float
    has_iou_head: bool

    def decode_and_nms(self, outputs: dict) -> dict:
        """Raw head outputs -> final detections (reference test_forward,
        single_stage_detector.py:195-227 + postprocessor.py:49)."""
        base_xyz = outputs["base_xyz"]
        anchors = self.anchors(base_xyz)
        boxes = self.coder.decode(
            base_xyz,
            outputs["offset"],
            outputs["angle_cls"],
            outputs["angle_res"],
            anchors,
        )  # [bs, n, cls, 7]
        if self.cls_activation == "Softmax":
            score = jax.nn.softmax(outputs["cls"], axis=-1)[..., 1:]
        else:
            score = jax.nn.sigmoid(outputs["cls"])
        if self.has_iou_head:
            score = score * outputs["iou"]
        bev = boxes_to_bev_aabb(boxes)
        det = batched_class_nms(
            boxes, bev, score, self.max_output, self.nms_threshold
        )
        # nuScenes velocity/attribute heads: gather the per-point auxiliary
        # predictions for the kept detections (reference intent,
        # single_stage_detector.py:195-227 — its nuScenes branch never ran).
        # Heads emit [bs, n, reg_base, C]; pick the detection's source point
        # and its class's regression slot.
        for key in ("velocity", "attribute"):
            if key in outputs:
                arr = outputs[key]
                by_point = jnp.take_along_axis(
                    arr, det["index"][:, :, None, None], axis=1
                )  # [bs, k, reg_base, C]
                slot = jnp.minimum(det["classes"], arr.shape[2] - 1)
                det[key] = jnp.take_along_axis(
                    by_point, slot[:, :, None, None], axis=2
                )[:, :, 0, :]
        return det


def build_detector(cfg, stage: str = "FIRST_STAGE", axis_name: str | None = None):
    """Config -> (module, spec). Mirrors the wiring in the reference
    SingleStageDetector.__init__ (single_stage_detector.py:19-70)."""
    stage_cfg = cfg.MODEL[stage]
    net_cfg = cfg.MODEL.NETWORK[stage]
    if cfg.DATASET.TYPE == "KITTI":
        cls_list = tuple(cfg.DATASET.KITTI.CLS_LIST)
    else:
        cls_list = tuple(cfg.DATASET.NUSCENES.CLS_LIST)

    reg_method = stage_cfg.REGRESSION_METHOD.TYPE
    coder = BoxCoder(
        reg_method,
        cfg.MODEL.ANGLE_CLS_NUM,
        half_range=stage_cfg.REGRESSION_METHOD.HALF_BIN_SEARCH_RANGE,
        num_bins=stage_cfg.REGRESSION_METHOD.BIN_CLASS_NUM,
    )
    anchors = AnchorGenerator(cfg.DATASET.TYPE, cls_list, reg_method)
    reg_base = 1 if reg_method.endswith("free") else len(cls_list)

    import jax.numpy as _jnp

    compute_dtype = (
        _jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else None
    )
    module = SingleStageDetector(
        compute_dtype=compute_dtype,
        architecture=tuple(tuple(layer) for layer in net_cfg.ARCHITECTURE),
        head_cfg=tuple(tuple(h) for h in net_cfg.HEAD),
        max_translate_range=tuple(cfg.MODEL.MAX_TRANSLATE_RANGE),
        num_classes=len(cls_list),
        num_angle_cls=cfg.MODEL.ANGLE_CLS_NUM,
        reg_base=reg_base,
        reg_channels=coder.reg_channels,
        cls_activation=stage_cfg.CLS_ACTIVATION,
        predict_attr_velo=stage_cfg.PREDICT_ATTRIBUTE_AND_VELOCITY,
        aggregation_sa_feature=cfg.MODEL.NETWORK.AGGREGATION_SA_FEATURE,
        use_gn=cfg.MODEL.NETWORK.USE_GN,
        axis_name=axis_name,
        remat=cfg.TPU.REMAT_SA_LAYERS,
    )
    spec = DetectorSpec(
        cls_list=cls_list,
        coder=coder,
        anchors=anchors,
        cls_activation=stage_cfg.CLS_ACTIVATION,
        max_output=stage_cfg.MAX_OUTPUT_NUM,
        nms_threshold=stage_cfg.NMS_THRESH,
        has_iou_head=any(h[5] == "IoU" for h in net_cfg.HEAD),
    )
    return module, spec
