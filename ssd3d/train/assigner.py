"""On-device target assignment.

The reference assigns targets on the HOST inside the train graph: a C++
rotated-IoU op feeds `tf.py_func` numpy code with per-step `np.random.choice`
minibatch sampling (target_assigner.py:119/:147 + np_functions/gt_sampler.py).
Here the identical masking semantics run as pure JAX on device — point-in-box
membership, argmax GT assignment, distance gating, label masking, and
Gumbel-top-k minibatch subsampling keyed by the step RNG — so the whole train
step stays one compiled program.

Shapes (GT boxes are zero-padded to a static per-batch max, same contract as
the reference's pad-to-max batcher, data_provider.py:587-628):
    points      [bs, pts, 3]
    anchors     [bs, pts, cls, 7]  (anchor-free: the points themselves)
    gt_boxes    [bs, gt, 7]        zero rows = padding
    gt_labels   [bs, gt]           1-based; 0 = padding
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ssd3d.core.geometry import points_in_boxes
from ssd3d.core.iou import boxes_iou_bev_3d
from ssd3d.ops.grouping import query_points_iou

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AssignerConfig:
    method: str  # 'Mask' | 'IoU'
    iou_sample_type: str  # 'BEV' | '3D' | 'Point'
    minibatch_size: int  # -1: use every point
    positive_ratio: float
    pos_iou: float
    neg_iou: float
    effective_sample_range: float  # CLASSIFICATION_LOSS.SOFTMAX_SAMPLE_RANGE

    @classmethod
    def from_cfg(cls, stage_cfg):
        return cls(
            method=stage_cfg.ASSIGN_METHOD,
            iou_sample_type=stage_cfg.IOU_SAMPLE_TYPE,
            minibatch_size=stage_cfg.MINIBATCH_NUM,
            positive_ratio=stage_cfg.MINIBATCH_RATIO,
            pos_iou=stage_cfg.CLASSIFICATION_POS_IOU,
            neg_iou=stage_cfg.CLASSIFICATION_NEG_IOU,
            effective_sample_range=stage_cfg.CLASSIFICATION_LOSS.SOFTMAX_SAMPLE_RANGE,
        )


def _random_subset_mask(rng: Array, candidate: Array, k: Array, cap: int) -> Array:
    """Uniform without-replacement subset of up to min(k, |candidate|) true
    entries (semantics of np.random.choice(..., replace=False) in the
    reference, gt_sampler.py:147). candidate: bool [n]; cap: static max k."""
    n = candidate.shape[0]
    cap = min(cap, n)
    scores = jnp.where(candidate, jax.random.uniform(rng, (n,)), -jnp.inf)
    _, top_idx = jax.lax.top_k(scores, cap)
    take = jnp.minimum(jnp.sum(candidate), k)
    keep = jnp.arange(cap) < take
    mask = jnp.zeros((n,), bool).at[top_idx].set(keep)
    return mask & candidate


def _assign_single(
    cfg: AssignerConfig,
    rng: Array,
    points: Array,  # [pts, 3]
    anchors: Array,  # [pts, cls, 7 or 3]
    gt_boxes: Array,  # [gt, 7]
    gt_labels: Array,  # [gt]
    valid_mask: Array,  # [pts, cls]
):
    pts_num, cls_num = anchors.shape[:2]
    gt_valid = jnp.any(gt_boxes != 0, axis=-1)  # [gt]

    inside = points_in_boxes(points, gt_boxes) & gt_valid[None, :]  # [pts, gt]
    assigned_idx = jnp.argmax(inside, axis=-1)  # [pts]
    assigned_label = jnp.take(gt_labels, assigned_idx) - 1  # 0-based
    assigned_boxes = jnp.take(gt_boxes, assigned_idx, axis=0)  # [pts, 7]

    dist = jnp.linalg.norm(
        anchors[..., 0:3] - assigned_boxes[:, None, 0:3], axis=-1
    )  # [pts, cls]
    dist_ok = dist <= cfg.effective_sample_range

    if cls_num > 1:
        label_mask = (
            jnp.arange(cls_num)[None, :] == assigned_label[:, None]
        ).astype(jnp.float32)
    else:
        label_mask = jnp.ones((pts_num, cls_num), jnp.float32)

    if cfg.method == "Mask":
        fg = jnp.any(inside, axis=-1)  # [pts]
        pmask = fg[:, None] & dist_ok
        pmask = pmask.astype(jnp.float32) * label_mask * valid_mask
        nmask = (~fg)[:, None] & jnp.ones((pts_num, cls_num), bool)
        nmask = nmask.astype(jnp.float32) * label_mask * valid_mask
    else:  # IoU assignment
        iou_bev, iou_3d = boxes_iou_bev_3d(
            anchors.reshape(pts_num * cls_num, 7), gt_boxes
        )
        if cfg.iou_sample_type == "BEV":
            iou = iou_bev
        elif cfg.iou_sample_type == "3D":
            iou = iou_3d
        else:  # Point: membership-count IoU gated by 3D IoU
            iou = query_points_iou(
                points[None],
                anchors.reshape(1, pts_num * cls_num, 7),
                gt_boxes[None],
                iou_3d[None],
            )[0]
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
        iou = iou.reshape(pts_num, cls_num, -1)
        # IoU of each anchor with ITS assigned (point-membership) GT
        iou_assigned = jnp.take_along_axis(
            iou, assigned_idx[:, None, None], axis=-1
        )[..., 0]  # [pts, cls]
        # classes that don't match the assigned GT count as ignored (-1)
        iou_assigned = iou_assigned * label_mask + (label_mask - 1.0)
        pmask = (iou_assigned >= cfg.pos_iou) & dist_ok
        pmask = pmask.astype(jnp.float32) * valid_mask
        nmask = (iou_assigned < cfg.neg_iou) & (iou_assigned >= 0.05)
        nmask = nmask.astype(jnp.float32) * valid_mask

    if cfg.minibatch_size != -1:
        positive_size = int(cfg.minibatch_size * cfg.positive_ratio)
        rng_p, rng_n = jax.random.split(rng)
        pts_p = jnp.any(pmask > 0, axis=-1)
        pts_n = jnp.any(nmask > 0, axis=-1)
        sel_p = _random_subset_mask(
            rng_p, pts_p, jnp.int32(positive_size), cfg.minibatch_size
        )
        n_budget = cfg.minibatch_size - jnp.minimum(
            jnp.sum(pts_p), positive_size
        )
        sel_n = _random_subset_mask(rng_n, pts_n, n_budget, cfg.minibatch_size)
        pmask = pmask * sel_p[:, None].astype(jnp.float32)
        nmask = nmask * sel_n[:, None].astype(jnp.float32)

    return assigned_idx, pmask, nmask, assigned_boxes


def assign_targets(
    cfg: AssignerConfig,
    rng: Array,
    points: Array,
    anchors: Array,
    gt_boxes: Array,
    gt_labels: Array,
    gt_velocity: Array | None = None,
    gt_attribute: Array | None = None,
    valid_mask: Array | None = None,
) -> dict:
    """Batched assignment. Returns per-point-per-class targets; mirrors
    TargetAssigner.assign (target_assigner.py:37-77)."""
    bs, pts_num, cls_num = anchors.shape[:3]
    if anchors.shape[-1] == 3:  # anchor-free: treat points as zero-size boxes
        anchors7 = jnp.concatenate(
            [anchors, jnp.zeros(anchors.shape[:-1] + (4,), anchors.dtype)], axis=-1
        )
    else:
        anchors7 = anchors
    if valid_mask is None:
        valid_mask = jnp.ones((bs, pts_num, cls_num), jnp.float32)

    rngs = jax.random.split(rng, bs)
    assigned_idx, pmask, nmask, assigned_boxes = jax.vmap(
        partial(_assign_single, cfg)
    )(rngs, points, anchors7, gt_boxes, gt_labels, valid_mask)

    # gather per-point GT attributes by assigned index
    def take(x, idx):
        return jax.vmap(lambda a, i: jnp.take(a, i, axis=0))(x, idx)

    labels = take(gt_labels, assigned_idx)  # [bs, pts]
    # positive points keep their class id; negatives get 0
    # (reference: labels summed under pmask, target_assigner.py:57-59)
    gt_cls = (labels[..., None] * pmask.astype(labels.dtype)).sum(-1)

    out = {
        "assigned_idx": assigned_idx,  # [bs, pts]
        "pmask": pmask,  # [bs, pts, cls]
        "nmask": nmask,
        "gt_cls": gt_cls.astype(jnp.int32),  # [bs, pts]
        # assigned box per point, broadcast over the class axis like the
        # reference's group_point(gt_boxes, assigned_idx)
        "gt_boxes": jnp.broadcast_to(
            assigned_boxes[:, :, None, :], (bs, pts_num, cls_num, 7)
        ),
    }
    if gt_velocity is not None:
        vel = take(gt_velocity, assigned_idx)
        out["gt_velocity"] = jnp.broadcast_to(
            vel[:, :, None, :], (bs, pts_num, cls_num, 2)
        )
    if gt_attribute is not None:
        attr = take(gt_attribute, assigned_idx)
        out["gt_attribute"] = jnp.broadcast_to(
            attr[:, :, None], (bs, pts_num, cls_num)
        )
    return out


def vote_targets(vote_base: Array, gt_boxes: Array, expand: float = 0.1):
    """Vote-loss targets (np_functions/gt_sampler.py:28-61 vote_targets_np):
    mask = point inside any (expanded) GT box; target = offset from the vote
    base to the assigned box's VOLUMETRIC center.

    vote_base: [bs, pts, 3]; gt_boxes: [bs, gt, 7] (zero-padded).
    Returns (mask [bs, pts] f32, target [bs, pts, 3])."""

    def single(pts, boxes):
        valid = jnp.any(boxes != 0, axis=-1)
        inside = points_in_boxes(pts, boxes, expand=expand) & valid[None, :]
        mask = jnp.any(inside, axis=-1).astype(jnp.float32)
        idx = jnp.argmax(inside, axis=-1)
        assigned = jnp.take(boxes, idx, axis=0)
        ctr = assigned[:, 0:3].at[:, 1].add(-assigned[:, 4] / 2.0)
        return mask, ctr - pts

    return jax.vmap(single)(vote_base, gt_boxes)
