"""KITTI AP evaluator self-consistency (the reference's own test strategy:
evaluation/test_evaluate.py feeds GT as detections and expects AP ~= 100)."""

import numpy as np
import pytest

from ssd3d.eval.kitti_ap import (
    EvalObject,
    ap_from_curve,
    evaluate_kitti_ap,
    overlap_matrix,
)


def make_obj(x=0.0, z=20.0, ry=0.0, l=3.9, h=1.6, w=1.6, y=1.5, typ="Car",
             score=-1000.0, height_px=60.0, trunc=0.0, occ=0):
    return EvalObject(
        type=typ,
        box2d=np.array([100.0, 100.0, 160.0, 100.0 + height_px]),
        t=np.array([x, y, z]),
        l=l, h=h, w=w, ry=ry, alpha=0.0,
        truncation=trunc, occlusion=occ, score=score,
    )


def scene(rng, n):
    objs = []
    for i in range(n):
        objs.append(
            make_obj(
                x=rng.uniform(-30, 30), z=rng.uniform(5, 60),
                ry=rng.uniform(-np.pi, np.pi),
                l=rng.uniform(3, 5), h=rng.uniform(1.4, 1.8),
                w=rng.uniform(1.5, 1.9),
            )
        )
    return objs


def test_gt_as_detections_gives_100(rng):
    gt, det = [], []
    for i in range(20):
        objs = scene(rng, 4)
        gt.append(objs)
        det.append(
            [make_obj(o.t[0], o.t[2], o.ry, o.l, o.h, o.w, o.t[1],
                      score=rng.rand()) for o in objs]
        )
    res = evaluate_kitti_ap(gt, det, ("Car",))
    for metric in ("image", "ground", "3d"):
        assert res["Car"][metric][1] > 99.0, (metric, res)


def test_no_detections_gives_0(rng):
    gt = [scene(rng, 3) for _ in range(5)]
    det = [[] for _ in range(5)]
    res = evaluate_kitti_ap(gt, det, ("Car",))
    assert res["Car"]["3d"][1] == 0.0


def test_shifted_detections_drop_ap(rng):
    gt, det = [], []
    for i in range(10):
        objs = scene(rng, 3)
        gt.append(objs)
        det.append(
            [make_obj(o.t[0] + 2.5, o.t[2] + 2.5, o.ry, o.l, o.h, o.w,
                      o.t[1], score=rng.rand()) for o in objs]
        )
    res = evaluate_kitti_ap(gt, det, ("Car",))
    assert res["Car"]["3d"][1] < 10.0


def test_difficulty_gates(rng):
    # truncated/small GTs are ignored at easy difficulty but count at hard:
    # per scene, one clean GT (detected) + one hard GT (undetected)
    gt, det = [], []
    for i in range(100):
        easy_gt = make_obj(x=rng.uniform(-20, 20), trunc=0.0, occ=0,
                           height_px=60)
        hard_gt = make_obj(x=rng.uniform(-20, 20) + 50, trunc=0.4,
                           height_px=30)
        gt.append([easy_gt, hard_gt])
        det.append([make_obj(easy_gt.t[0], easy_gt.t[2], easy_gt.ry,
                             easy_gt.l, easy_gt.h, easy_gt.w, easy_gt.t[1],
                             score=rng.rand(), height_px=60)])
    res = evaluate_kitti_ap(gt, det, ("Car",))
    easy_ap, mod_ap, hard_ap = res["Car"]["3d"]
    assert easy_ap > 99.0  # hard GTs are ignored at easy difficulty
    assert hard_ap < 60.0  # they count as FN at hard difficulty


def _many_scenes(rng, extra_gt_typ, extra_det=True, n=100):
    """Scenes with one clean Car (always detected) plus one extra GT of
    `extra_gt_typ` that also gets a (Car-labeled) detection."""
    gt, det = [], []
    for i in range(n):
        car = make_obj(x=rng.uniform(-20, 20))
        extra = make_obj(x=rng.uniform(-20, 20) + 60, typ=extra_gt_typ)
        gt.append([car, extra])
        dets = [make_obj(car.t[0], car.t[2], car.ry, car.l, car.h, car.w,
                         car.t[1], score=rng.rand())]
        if extra_det:
            dets.append(make_obj(extra.t[0], extra.t[2], extra.ry, extra.l,
                                 extra.h, extra.w, extra.t[1],
                                 typ="Car", score=rng.rand()))
        det.append(dets)
    return gt, det


def test_van_neighbor_not_fp(rng):
    # detections matching Van GTs must not be punished as FP for Car
    gt, det = _many_scenes(rng, "Van")
    res = evaluate_kitti_ap(gt, det, ("Car",))
    assert res["Car"]["3d"][1] > 99.0


def test_dontcare_absorbs_fp(rng):
    gt, det = _many_scenes(rng, "DontCare")
    res = evaluate_kitti_ap(gt, det, ("Car",))
    assert res["Car"]["image"][1] > 99.0


def test_other_class_detection_is_fp(rng):
    # sanity inverse: spurious far-away detections DO hurt precision
    gt, det = _many_scenes(rng, "Van", extra_det=False)
    for d in det[:50]:
        d.append(make_obj(x=rng.uniform(-20, 20), z=65.0, score=0.99))
    res = evaluate_kitti_ap(gt, det, ("Car",))
    assert res["Car"]["3d"][1] < 90.0


def test_overlap_matrix_rotated(rng):
    a = [make_obj(ry=0.3)]
    b = [make_obj(ry=0.3)]
    for metric in ("ground", "3d"):
        ov = overlap_matrix(a, b, metric)
        assert ov[0, 0] == pytest.approx(1.0, abs=1e-6)


def test_ap_from_curve():
    assert ap_from_curve(np.ones(41)) == pytest.approx(100.0)
    assert ap_from_curve(np.zeros(41)) == 0.0
