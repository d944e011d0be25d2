"""PointRCNN/STD two-stage detector (reference modeling/double_stage_detector.py).

Stage 1 (RPN): PointNet++ encoder-decoder over the raw cloud, per-point
proposals, class-unaware NMS. Stage 2 (RCNN): RoI pooling of the RPN's
per-point features inside each proposal (RegionPool: canonical-rotated
interior points + mask/dist info, points_pooler.py:40; PointsPool: voxelized
RoI grid + VFE, points_pooler.py:64), then a small SA stack per proposal and
a refinement head seeded at the proposal centers.

Everything is fixed-shape: proposals are a static MAX_OUTPUT_NUM buffer with
validity masks; the train path subsamples a static MINIBATCH_NUM of them
(gather_by_mask) before pooling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssd3d.core.box_coders import AnchorGenerator, BoxCoder
from ssd3d.core.geometry import boxes_bottom_to_center, boxes_to_bev_aabb, rotate_points_y
from ssd3d.models.backbone import PointBackbone
from ssd3d.models.heads import DetectionHead, IoUHead
from ssd3d.nn.layers import SharedMLP
from ssd3d.ops.grouping import group_points, query_boxes_3d_mask, query_boxes_3d_points
from ssd3d.ops.nms import batched_class_nms, class_unaware_nms

Array = jax.Array


def expand_boxes(boxes: Array, context: float) -> Array:
    """Grow l/h/w by the context range (points_pooler.py:159)."""
    return jnp.concatenate(
        [boxes[..., 0:3], boxes[..., 3:6] + context, boxes[..., 6:7]], axis=-1
    )


def canonicalize_pool(pool_xyz: Array, proposals: Array) -> Array:
    """pool_xyz: [bs, p, ns, 3]; proposals: [bs, p, 7] -> canonical frame."""
    rel = pool_xyz - proposals[:, :, None, 0:3]
    return rotate_points_y(rel, -proposals[..., 6])


class RegionPool(nn.Module):
    """PointRCNN RoI pooling (points_pooler.py:40 region_pool)."""

    sample_pts_num: int
    context_range: float
    info_keys: Sequence[str]
    align_channels: Sequence[int]
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, base_xyz, base_feature, base_mask, proposals, train,
                 bn_momentum=0.9):
        """base_*: [bs, pts, *]; proposals: [bs, p, 7]
        -> (pool_output [bs*p, ns, 3+c'], pool_mask [bs, p, 1])."""
        expanded = expand_boxes(proposals, self.context_range)
        idx, cnt = query_boxes_3d_points(base_xyz, expanded, self.sample_pts_num)
        has = (cnt > 0).astype(jnp.int32)[..., None]  # [bs, p, 1]
        idx = idx * has
        pool_xyz = group_points(base_xyz, idx)  # [bs, p, ns, 3]
        pool_feat = group_points(base_feature, idx)
        info = []
        for key in self.info_keys:
            if key == "mask":
                info.append(group_points(base_mask, idx))
            elif key == "dist":
                info.append(jnp.linalg.norm(pool_xyz, axis=-1, keepdims=True))
        info = jnp.concatenate(info, axis=-1)

        canonical = canonicalize_pool(pool_xyz, expanded)
        extra = jnp.concatenate([canonical, info], axis=-1)
        encoded = SharedMLP(
            tuple(self.align_channels), bn=self.bn, use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="align",
        )(extra, train, bn_momentum)
        out = jnp.concatenate([canonical, encoded, pool_feat], axis=-1)
        bs, p, ns, c = out.shape
        return out.reshape(bs * p, ns, c), has


class PointsPool(nn.Module):
    """STD-style voxelizing RoI pooler + VFE (points_pooler.py:64 +
    tf_points_pooling CUDA op): interior points scattered into an l*h*w grid
    (first `sample_num` per voxel), per-voxel VFE maxpool, voxel centers as
    "pillar" coordinates."""

    sample_pts_num: int
    context_range: float
    info_keys: Sequence[str]
    align_channels: Sequence[int]
    grid: Sequence[int]  # (l, h, w, sample_num)
    vfe_channels: Sequence[int]
    bn: bool = True
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, base_xyz, base_feature, base_mask, proposals, train,
                 bn_momentum=0.9):
        from ssd3d.ops.grouping import _first_k_selection

        gl, gh, gw, vox_k = self.grid
        nvox = gl * gh * gw
        expanded = expand_boxes(proposals, self.context_range)
        idx, cnt = query_boxes_3d_points(base_xyz, expanded, self.sample_pts_num)
        has = (cnt > 0).astype(jnp.int32)[..., None]
        idx = idx * has
        pool_xyz = group_points(base_xyz, idx)
        pool_feat = group_points(base_feature, idx)
        info = []
        for key in self.info_keys:
            if key == "mask":
                info.append(group_points(base_mask, idx))
            elif key == "dist":
                info.append(jnp.linalg.norm(pool_xyz, axis=-1, keepdims=True))
        info = jnp.concatenate(info, axis=-1)
        canonical = canonicalize_pool(pool_xyz, expanded)  # [bs, p, ns, 3]

        # voxel id of each pooled point in the canonical box frame
        bs, p, ns, _ = canonical.shape
        size = expanded[..., 3:6]  # l, h, w
        # canonical x in [-l/2, l/2] -> [0, gl); y in [-h, 0] -> [0, gh); z likewise
        fx = (canonical[..., 0] / size[..., None, 0] + 0.5) * gl
        fy = (canonical[..., 1] / size[..., None, 1] + 1.0) * gh
        fz = (canonical[..., 2] / size[..., None, 2] + 0.5) * gw
        vx = jnp.clip(fx.astype(jnp.int32), 0, gl - 1)
        vy = jnp.clip(fy.astype(jnp.int32), 0, gh - 1)
        vz = jnp.clip(fz.astype(jnp.int32), 0, gw - 1)
        vox_id = (vx * gh + vy) * gw + vz  # [bs, p, ns]

        # first-k points per voxel, reusing the dense first-k machinery:
        # valid[v, j] = (vox_id[j] == v)
        flat_vox = vox_id.reshape(bs * p, ns)
        valid = (
            flat_vox[:, None, :] == jnp.arange(nvox, dtype=jnp.int32)[None, :, None]
        )  # [bs*p, nvox, ns]
        sel_idx, sel_cnt = jax.vmap(lambda v: _first_k_selection(v, vox_k))(valid)
        # gather per-voxel point features
        feats = jnp.concatenate([canonical, info, pool_feat], axis=-1)
        feats = feats.reshape(bs * p, ns, -1)
        gathered = jax.vmap(
            lambda f, i: f[i.reshape(-1)].reshape(nvox, vox_k, -1)
        )(feats, sel_idx)
        vox_has = (sel_cnt > 0).astype(feats.dtype)[..., None]  # [bs*p, nvox, 1]

        # voxel centers in the canonical frame
        ii = jnp.arange(nvox, dtype=jnp.int32)
        cx = ((ii // (gh * gw)).astype(jnp.float32) + 0.5) / gl - 0.5
        cy = (((ii // gw) % gh).astype(jnp.float32) + 0.5) / gh - 1.0
        cz = ((ii % gw).astype(jnp.float32) + 0.5) / gw - 0.5
        unit_ctrs = jnp.stack([cx, cy, cz], axis=-1)  # [nvox, 3] in unit box
        vox_ctrs = unit_ctrs[None, None] * size[..., None, :]  # [bs, p, nvox, 3]
        vox_ctrs = vox_ctrs.reshape(bs * p, nvox, 3)

        # pillar offset info: point canonical xyz minus its voxel center
        g_xyz = gathered[..., 0:3]
        pillar = g_xyz - vox_ctrs[:, :, None, :]
        vfe_in = jnp.concatenate([gathered, pillar], axis=-1)
        encoded = SharedMLP(
            tuple(self.align_channels), bn=self.bn, use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="align",
        )(vfe_in, train, bn_momentum)
        encoded = SharedMLP(
            tuple(self.vfe_channels), bn=self.bn, use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype, name="vfe",
        )(encoded, train, bn_momentum)
        dense = jnp.max(encoded, axis=2) * vox_has  # [bs*p, nvox, c]
        out = jnp.concatenate([vox_ctrs, dense], axis=-1)
        return out, has


class TwoStageDetector(nn.Module):
    """RPN + RCNN under one parameter tree; stages exposed as methods so the
    train orchestrator can assign/subsample proposals between them."""

    rpn_architecture: Sequence
    rpn_head_cfg: Sequence
    rcnn_architecture: Sequence
    rcnn_head_cfg: Sequence
    pooler_cfg: Sequence
    max_translate_range: Sequence[float]
    num_classes: int
    num_angle_cls: int
    rpn_cls_channels: int
    rpn_reg_base: int
    rpn_reg_channels: int
    rcnn_cls_channels: int
    rcnn_reg_base: int
    rcnn_reg_channels: int
    aggregation_sa_feature: bool = False
    use_gn: bool = False
    axis_name: str | None = None
    compute_dtype: Any = None
    remat: bool = False

    def setup(self):
        self.rpn_backbone = PointBackbone(
            architecture=self.rpn_architecture,
            max_translate_range=self.max_translate_range,
            aggregation_sa_feature=self.aggregation_sa_feature,
            use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            remat=self.remat,
            name="rpn_backbone",
        )
        heads = []
        for i, spec in enumerate(self.rpn_head_cfg):
            _, _, _, mlp, bn, head_type, scope = spec
            assert head_type == "Det", "RPN IoU head not used by shipped configs"
            heads.append(DetectionHead(
                mlp=tuple(mlp), cls_channels=self.rpn_cls_channels,
                reg_base=self.rpn_reg_base, reg_channels=self.rpn_reg_channels,
                num_angle_cls=self.num_angle_cls, bn=bn,
                use_gn=self.use_gn, axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                name=scope or f"rpn_head{i}",
            ))
        self.rpn_heads_mods = heads

        pc = self.pooler_cfg
        pool_kwargs = dict(
            sample_pts_num=pc[3], context_range=pc[4],
            info_keys=tuple(pc[1]), align_channels=tuple(pc[2]),
            bn=pc[7], use_gn=self.use_gn, axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            name=pc[8] or "roi_pool",
        )
        if pc[0] == "RegionPool":
            self.pooler = RegionPool(**pool_kwargs)
        else:
            self.pooler = PointsPool(
                grid=tuple(pc[5]), vfe_channels=tuple(pc[6]), **pool_kwargs
            )

        self.rcnn_backbone = PointBackbone(
            architecture=self.rcnn_architecture,
            max_translate_range=self.max_translate_range,
            aggregation_sa_feature=self.aggregation_sa_feature,
            use_gn=self.use_gn,
            axis_name=self.axis_name, compute_dtype=self.compute_dtype,
            remat=self.remat,
            name="rcnn_backbone",
        )
        rheads = []
        for i, spec in enumerate(self.rcnn_head_cfg):
            _, _, _, mlp, bn, head_type, scope = spec
            rheads.append(DetectionHead(
                mlp=tuple(mlp), cls_channels=self.rcnn_cls_channels,
                reg_base=self.rcnn_reg_base, reg_channels=self.rcnn_reg_channels,
                num_angle_cls=self.num_angle_cls, bn=bn,
                use_gn=self.use_gn, axis_name=self.axis_name, compute_dtype=self.compute_dtype,
                name=scope or f"rcnn_head{i}",
            ))
        self.rcnn_heads_mods = rheads

    # ------------------------------------------------------------------
    def rpn(self, points: Array, train: bool, bn_momentum=0.9) -> dict:
        net = self.rpn_backbone(points, train, bn_momentum)
        out = {"vote_base": net["vote_base"], "vote_offset": net["vote_offset"]}
        xyzs, preds = [], []
        for head, spec in zip(self.rpn_heads_mods, self.rpn_head_cfg):
            xyz_idx, feat_idx = spec[0], spec[1]
            xyz_in = jnp.concatenate([net["xyz"][j] for j in xyz_idx], axis=1)
            feat_in = jnp.concatenate([net["features"][j] for j in feat_idx], axis=1)
            preds.append(head(feat_in, train, bn_momentum))
            xyzs.append(xyz_in)
        out["base_xyz"] = jnp.concatenate(xyzs, axis=1)
        for key in ("feature", "cls", "offset", "angle_cls", "angle_res"):
            out[key] = jnp.concatenate([p[key] for p in preds], axis=1)
        return out

    def rcnn(self, base_xyz, base_feature, base_mask, proposals, train,
             bn_momentum=0.9) -> dict:
        """proposals: [bs, p, 7] (bottom-face format).
        Returns per-proposal refinement predictions [bs, p, ...]."""
        bs, p = proposals.shape[:2]
        pool_out, pool_mask = self.pooler(
            base_xyz, base_feature, base_mask, proposals, train, bn_momentum
        )
        ctr = boxes_bottom_to_center(proposals)[..., 0:3]
        net = self.rcnn_backbone(
            pool_out, train, bn_momentum,
            prefix_xyz=(ctr,), prefix_features=(None,),
        )
        out = {"pool_mask": pool_mask}
        preds, xyzs = [], []
        for head, spec in zip(self.rcnn_heads_mods, self.rcnn_head_cfg):
            xyz_idx, feat_idx = spec[0], spec[1]
            xyz_in = jnp.concatenate([net["xyz"][j] for j in xyz_idx], axis=1)
            feat_in = jnp.concatenate(
                [net["features"][j] for j in feat_idx], axis=1
            )
            # pooled features are [bs*p, ...]; fold back to [bs, p, c]
            if feat_in.ndim == 2:
                feat_in = feat_in.reshape(bs, p, -1)
            elif feat_in.shape[0] == bs * p:
                feat_in = feat_in.reshape(bs, p, -1)
            preds.append(head(feat_in, train, bn_momentum))
            xyzs.append(xyz_in.reshape(bs, p, 3) if xyz_in.shape[0] != bs else xyz_in)
        out["base_xyz"] = jnp.concatenate(xyzs, axis=1)
        for key in ("feature", "cls", "offset", "angle_cls", "angle_res"):
            out[key] = jnp.concatenate([pr[key] for pr in preds], axis=1)
        return out

    def __call__(self, points: Array, train: bool, bn_momentum=0.9,
                 rpn_spec=None, rcnn_spec=None):
        """Full test-mode forward (used for init and inference)."""
        rpn_out = self.rpn(points, train, bn_momentum)
        assert rpn_spec is not None
        proposals, scores, valid = rpn_spec.propose(rpn_out)
        base_mask = (
            jax.nn.sigmoid(jnp.max(rpn_out["cls"], axis=-1, keepdims=True))
        )
        rcnn_out = self.rcnn(
            rpn_out["base_xyz"], rpn_out["feature"],
            (base_mask >= 0.5).astype(jnp.float32),
            proposals, train, bn_momentum,
        )
        rcnn_out["proposals"] = proposals
        rcnn_out["proposal_scores"] = scores
        rcnn_out["proposal_valid"] = valid
        rcnn_out["rpn"] = rpn_out
        return rcnn_out


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """Per-stage codec + postprocessing params."""

    cls_list: tuple
    coder: BoxCoder
    anchors: AnchorGenerator
    cls_activation: str
    max_output: int
    nms_threshold: float
    nms_pre_topk: int = 0

    def decode(self, outputs: dict) -> Array:
        anchors = self.anchors(outputs["base_xyz"])
        return self.coder.decode(
            outputs["base_xyz"], outputs["offset"], outputs["angle_cls"],
            outputs["angle_res"], anchors,
        )

    def scores(self, outputs: dict) -> Array:
        if self.cls_activation == "Softmax":
            return jax.nn.softmax(outputs["cls"], axis=-1)[..., 1:]
        return jax.nn.sigmoid(outputs["cls"])

    def propose(self, outputs: dict):
        """RPN outputs -> fixed-size class-unaware proposals."""
        boxes = self.decode(outputs)
        return class_unaware_nms(
            boxes, self.scores(outputs), self.max_output, self.nms_threshold,
            pre_topk=self.nms_pre_topk,
        )


def _stage_fields(cfg, stage: str, cls_list, nms_pre_topk=0) -> dict:
    sc = cfg.MODEL[stage]
    coder = BoxCoder(
        sc.REGRESSION_METHOD.TYPE, cfg.MODEL.ANGLE_CLS_NUM,
        half_range=sc.REGRESSION_METHOD.HALF_BIN_SEARCH_RANGE,
        num_bins=sc.REGRESSION_METHOD.BIN_CLASS_NUM,
    )
    return dict(
        cls_list=tuple(cls_list),
        coder=coder,
        anchors=AnchorGenerator(
            cfg.DATASET.TYPE, cls_list, sc.REGRESSION_METHOD.TYPE
        ),
        cls_activation=sc.CLS_ACTIVATION,
        max_output=sc.MAX_OUTPUT_NUM,
        nms_threshold=sc.NMS_THRESH,
        nms_pre_topk=nms_pre_topk,
    )


@dataclasses.dataclass(frozen=True)
class ProposalSpec(StageSpec):
    """Stage-2 spec whose anchors ARE the stage-1 proposals: decode reads the
    proposal boxes stashed in the outputs dict instead of generating."""

    def decode(self, outputs: dict) -> Array:
        anchors = outputs["proposals"][:, :, None, :]
        ctr = boxes_bottom_to_center(outputs["proposals"])[..., 0:3]
        return self.coder.decode(
            ctr, outputs["offset"], outputs["angle_cls"],
            outputs["angle_res"], anchors,
        )

    def final_detections(self, outputs: dict) -> dict:
        boxes = self.decode(outputs)
        score = self.scores(outputs)
        if "pool_mask" in outputs:
            score = score * outputs["pool_mask"].astype(score.dtype)
        bev = boxes_to_bev_aabb(boxes)
        return batched_class_nms(
            boxes, bev, score, self.max_output, self.nms_threshold
        )


def build_two_stage(cfg, axis_name: str | None = None, nms_pre_topk=2048):
    if cfg.DATASET.TYPE == "KITTI":
        cls_list = tuple(cfg.DATASET.KITTI.CLS_LIST)
    else:
        cls_list = tuple(cfg.DATASET.NUSCENES.CLS_LIST)
    rpn_spec = StageSpec(**_stage_fields(cfg, "FIRST_STAGE", cls_list, nms_pre_topk))
    rcnn_spec = ProposalSpec(**_stage_fields(cfg, "SECOND_STAGE", cls_list))

    def cls_ch(stage_cfg):
        return (
            len(cls_list) if stage_cfg.CLS_ACTIVATION == "Sigmoid"
            else len(cls_list) + 1
        )

    s1, s2 = cfg.MODEL.FIRST_STAGE, cfg.MODEL.SECOND_STAGE
    compute_dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else None
    )
    model = TwoStageDetector(
        compute_dtype=compute_dtype,
        rpn_architecture=tuple(
            tuple(l) for l in cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
        ),
        rpn_head_cfg=tuple(tuple(h) for h in cfg.MODEL.NETWORK.FIRST_STAGE.HEAD),
        rcnn_architecture=tuple(
            tuple(l) for l in cfg.MODEL.NETWORK.SECOND_STAGE.ARCHITECTURE
        ),
        rcnn_head_cfg=tuple(tuple(h) for h in cfg.MODEL.NETWORK.SECOND_STAGE.HEAD),
        pooler_cfg=tuple(
            tuple(x) if isinstance(x, list) else x
            for x in cfg.MODEL.NETWORK.FIRST_STAGE.POINTS_POOLER
        ),
        max_translate_range=tuple(cfg.MODEL.MAX_TRANSLATE_RANGE),
        num_classes=len(cls_list),
        num_angle_cls=cfg.MODEL.ANGLE_CLS_NUM,
        rpn_cls_channels=cls_ch(s1),
        rpn_reg_base=1 if s1.REGRESSION_METHOD.TYPE.endswith("free") else len(cls_list),
        rpn_reg_channels=rpn_spec.coder.reg_channels,
        rcnn_cls_channels=cls_ch(s2),
        rcnn_reg_base=1 if s2.REGRESSION_METHOD.TYPE.endswith("free") else len(cls_list),
        rcnn_reg_channels=rcnn_spec.coder.reg_channels,
        aggregation_sa_feature=cfg.MODEL.NETWORK.AGGREGATION_SA_FEATURE,
        use_gn=cfg.MODEL.NETWORK.USE_GN,
        axis_name=axis_name,
        remat=cfg.TPU.REMAT_SA_LAYERS,
    )
    return model, rpn_spec, rcnn_spec
