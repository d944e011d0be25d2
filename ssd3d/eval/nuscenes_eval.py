"""Native nuScenes-style detection metrics (center-distance mAP + NDS).

The reference shells out to the nuScenes devkit (which is broken/absent in
its tree — SURVEY.md §2.9); this is a self-contained implementation of the
published CVPR-2019 protocol:

- matching by BEV center distance at thresholds {0.5, 1, 2, 4} m
- AP = normalized area of the (max-)precision/recall curve restricted to
  recall, precision > 10%
- TP errors at the 2 m threshold: ATE (center distance), ASE (1 - aligned
  3D IoU = 1 - min-ratio volume overlap), AOE (yaw delta, period pi for
  barriers), AVE (velocity L2), AAE (1 - attribute accuracy)
- NDS = (5*mAP + sum_tp max(0, 1 - err)) / 10

Boxes here use the framework-wide camera-style box_3d convention; the BEV
plane is (x, z).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1

# classes with no meaningful orientation period / velocity / attribute
NO_VELOCITY = {"barrier", "traffic_cone"}
NO_ATTRIBUTE = {"barrier", "traffic_cone"}
PERIOD_PI = {"barrier"}


@dataclasses.dataclass
class NuscBox:
    cls: str
    center: np.ndarray  # (x, y_bottom, z)
    size: np.ndarray  # (l, h, w)
    ry: float
    velocity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2)
    )
    attribute: int = -1
    score: float = -1.0

    @property
    def bev_center(self):
        return np.array([self.center[0], self.center[2]])


def _angle_diff(a, b, period):
    d = (a - b) % period
    return min(d, period - d)


def _aligned_iou_3d(det: NuscBox, gt: NuscBox) -> float:
    """IoU of the two boxes translated/rotated onto each other (size-only)."""
    inter = np.prod(np.minimum(det.size, gt.size))
    union = np.prod(det.size) + np.prod(gt.size) - inter
    return float(inter / max(union, 1e-9))


def _accumulate(gts, dets, cls: str, dist_th: float):
    """One class, one threshold over the whole split.

    Returns (precision [nd], recall [nd], tp_errors dict of lists)."""
    gt_cls = [[g for g in frame if g.cls == cls] for frame in gts]
    npos = sum(len(f) for f in gt_cls)
    all_dets = []
    for i, frame in enumerate(dets):
        for d in frame:
            if d.cls == cls:
                all_dets.append((i, d))
    all_dets.sort(key=lambda x: -x[1].score)

    taken = [set() for _ in gts]
    tp, fp = [], []
    errs = {"trans": [], "scale": [], "orient": [], "vel": [], "attr": []}
    for frame_i, det in all_dets:
        best, best_j = np.inf, -1
        for j, gt in enumerate(gt_cls[frame_i]):
            if j in taken[frame_i]:
                continue
            dist = np.linalg.norm(det.bev_center - gt.bev_center)
            if dist < best:
                best, best_j = dist, j
        if best < dist_th:
            taken[frame_i].add(best_j)
            tp.append(1.0)
            fp.append(0.0)
            gt = gt_cls[frame_i][best_j]
            errs["trans"].append(best)
            errs["scale"].append(1.0 - _aligned_iou_3d(det, gt))
            period = math.pi if cls in PERIOD_PI else 2 * math.pi
            errs["orient"].append(_angle_diff(det.ry, gt.ry, period))
            if cls not in NO_VELOCITY:
                errs["vel"].append(
                    float(np.linalg.norm(det.velocity - gt.velocity))
                )
            if cls not in NO_ATTRIBUTE and gt.attribute >= 0:
                errs["attr"].append(float(det.attribute != gt.attribute))
        else:
            tp.append(0.0)
            fp.append(1.0)

    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / max(npos, 1)
    precision = tp / np.maximum(tp + fp, 1e-9)
    return precision, recall, errs, npos


def _ap_from_pr(precision, recall) -> float:
    """Normalized AP over the (0.1, 1] recall range with the 10% precision
    floor (devkit's calc_ap)."""
    if len(recall) == 0:
        return 0.0
    rec_interp = np.linspace(0, 1, 101)
    prec = np.interp(rec_interp, recall, precision, right=0)
    # running max from the right (devkit interpolates on raw curve; close)
    prec = np.maximum.accumulate(prec[::-1])[::-1]
    prec = prec[rec_interp >= MIN_RECALL + 1e-9]
    prec = np.maximum(prec - MIN_PRECISION, 0)
    return float(np.mean(prec) / (1.0 - MIN_PRECISION))


def evaluate_nuscenes(gts, dets, cls_list) -> dict:
    """gts/dets: per-frame lists of NuscBox. Returns per-class APs, TP
    errors, mAP, and NDS."""
    results: dict = {"per_class": {}}
    aps_all, tp_errs_all = [], {k: [] for k in
                                ("trans", "scale", "orient", "vel", "attr")}
    for cls in cls_list:
        aps = []
        cls_errs = None
        for th in DIST_THRESHOLDS:
            precision, recall, errs, npos = _accumulate(gts, dets, cls, th)
            aps.append(_ap_from_pr(precision, recall) if npos else 0.0)
            if th == TP_THRESHOLD:
                cls_errs = errs
        mean_ap = float(np.mean(aps))
        entry = {"ap": aps, "mean_ap": mean_ap}
        for key, vals in (cls_errs or {}).items():
            applicable = not (
                (key == "vel" and cls in NO_VELOCITY)
                or (key == "attr" and cls in NO_ATTRIBUTE)
            )
            if applicable:
                err = float(np.mean(vals)) if vals else 1.0
                entry[key] = err
                tp_errs_all[key].append(err)
        results["per_class"][cls] = entry
        aps_all.append(mean_ap)

    mAP = float(np.mean(aps_all)) if aps_all else 0.0
    tp_scores = [
        max(0.0, 1.0 - float(np.mean(v))) for v in tp_errs_all.values() if v
    ]
    nds = (5.0 * mAP + sum(tp_scores)) / (5.0 + len(tp_scores))
    results["mAP"] = mAP
    results["NDS"] = float(nds)
    return results
