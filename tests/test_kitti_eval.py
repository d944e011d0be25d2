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


# ---------------------------------------------------------------------------
# worked examples: exact 41-point curves derived by hand from the devkit
# protocol (evaluate.cpp getThresholds/eval_class) — these pin the protocol
# at the curve level, not just AP>threshold
# ---------------------------------------------------------------------------

def test_worked_example_sparse_curve():
    """1 image, 2 easy GTs; det A hits GT1 (score .9), det B is a FP
    (score .8). Devkit: v=[.9], n_gt=2 -> thresholds=[.9]; at .9 det B is
    score-ignored, so tp=1 fp=0 -> precision=[1,0,...]; the curve is
    indexed by THRESHOLD, never backfilled to the real recall=0.5, so
    AP = 1/11*100 — the devkit's own small-sample quirk, reproduced
    exactly."""
    from ssd3d.eval.kitti_ap import eval_class

    def obj(x, score=-1000.0):
        o = make_obj(x=x, score=score)
        o.box2d = o.box2d + np.array([x * 10, 0, x * 10, 0])  # distinct 2D
        return o

    gt = [obj(0), obj(20)]
    det = [obj(0, score=0.9), obj(40, score=0.8)]
    for metric in ("image", "ground", "3d"):
        prec, _ = eval_class([gt], [det], 0, 0, metric, use_native=False)
        expected = np.zeros(41)
        expected[0] = 1.0
        np.testing.assert_allclose(prec, expected, atol=1e-12)
    res = evaluate_kitti_ap([gt], [det], ("Car",))
    assert res["Car"]["3d"][0] == pytest.approx(100.0 / 11.0)


def test_worked_example_exact_curve():
    """8 images x 1 easy GT with matching det scores .9..-.1..-.2 plus two
    FPs (scores .65, .25) in image 0. Thresholds = all 8 TP scores;
    tp_i=i+1; fp counts FPs with score >= threshold:
      p = [1, 1, 1, 4/5, 5/6, 6/7, 7/8, 8/10, 0...]
    right-max -> [1, 1, 1, 7/8, 7/8, 7/8, 7/8, .8, 0...]
    AP = (p0 + p4)/11*100 = (1 + 7/8)/11*100."""
    from ssd3d.eval.kitti_ap import eval_class

    def obj(x, score=-1000.0):
        o = make_obj(x=x, score=score)
        o.box2d = o.box2d + np.array([x * 5, 0, x * 5, 0])  # distinct 2D
        return o

    scores = [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2]
    gts, dets = [], []
    for i, s in enumerate(scores):
        x = float(i * 10 - 30)
        img_dets = [obj(x, score=s)]
        if i == 0:
            img_dets += [obj(200.0, score=0.65), obj(300.0, score=0.25)]
        gts.append([obj(x)])
        dets.append(img_dets)

    expected = np.zeros(41)
    expected[0:3] = 1.0
    expected[3:7] = 7.0 / 8.0
    expected[7] = 0.8
    for metric in ("image", "ground", "3d"):
        prec, _ = eval_class(gts, dets, 0, 0, metric, use_native=False)
        np.testing.assert_allclose(prec, expected, atol=1e-12, err_msg=metric)
    res = evaluate_kitti_ap(gts, dets, ("Car",))
    for metric in ("image", "ground", "3d"):
        for difficulty in range(3):
            assert res["Car"][metric][difficulty] == pytest.approx(
                (1.0 + 7.0 / 8.0) / 11.0 * 100.0
            )


def test_worked_example_aos():
    """AOS: similarity per TP = (1+cos(delta_alpha))/2, divided by tp+fp,
    right-max filtered. delta=0 -> aos == precision; delta=pi -> aos == 0."""
    from ssd3d.eval.kitti_ap import eval_class

    for delta, factor in ((0.0, 1.0), (np.pi, 0.0), (np.pi / 2, 0.5)):
        gts, dets = [], []
        for i in range(4):
            g = make_obj(x=float(i * 10 - 15))
            d = make_obj(x=float(i * 10 - 15), score=0.9 - 0.1 * i)
            d.alpha = g.alpha + delta
            gts.append([g])
            dets.append([d])
        prec, aos = eval_class(gts, dets, 0, 0, "image",
                               compute_aos=True, use_native=False)
        np.testing.assert_allclose(aos, prec * factor, atol=1e-12)


def test_reference_resfile_detections():
    """Consume the reference's checked-in evaluator artifacts
    (lib/utils/tf_ops/evaluation/results/resfiles/data/*.txt, written by
    evaluate.cpp's saveStats run): parse them with our KITTI txt reader,
    check exact field decoding, then feed them as GT+detections and verify
    the difficulty-gate arithmetic on their real box heights."""
    import glob
    import os

    from ssd3d.data.kitti_io import read_labels
    from ssd3d.eval.kitti_ap import EvalObject

    resdir = "/root/reference/lib/utils/tf_ops/evaluation/results/resfiles/data"
    files = sorted(glob.glob(os.path.join(resdir, "*.txt")))
    if not files:
        pytest.skip("reference resfiles not available")
    per_image = [read_labels(f) for f in files]
    assert [len(o) for o in per_image] == [1, 2, 1]

    # exact field decode of a reference-written line (data/000001.txt:1)
    car = per_image[1][0]
    assert car.type == "Car"
    assert car.alpha == pytest.approx(1.85)
    np.testing.assert_allclose(car.box2d, [387.63, 181.54, 423.81, 203.12])
    assert (car.h, car.w, car.l) == (1.67, 1.87, 3.69)
    np.testing.assert_allclose(car.t, [-16.53, 2.39, 58.49])
    assert car.ry == pytest.approx(1.57)
    assert car.score == pytest.approx(0.99)

    def to_eval(o, as_gt):
        return EvalObject(
            type=o.type, box2d=np.asarray(o.box2d, float),
            t=np.asarray(o.t, float), l=o.l, h=o.h, w=o.w, ry=o.ry,
            alpha=o.alpha, truncation=o.truncation, occlusion=o.occlusion,
            score=-1000.0 if as_gt else o.score,
        )

    gts = [[to_eval(o, True) for o in objs] for objs in per_image]
    dets = [[to_eval(o, False) for o in objs] for objs in per_image]
    res = evaluate_kitti_ap(gts, dets, ("Car", "Pedestrian", "Cyclist"))

    # heights: Car 000001 21.58px (ignored everywhere: <=40 easy, <=25 m/h),
    # Car 000003 103px (valid all); GT==det with one threshold -> AP=100/11
    for difficulty in range(3):
        assert res["Car"]["3d"][difficulty] == pytest.approx(100.0 / 11.0)
        assert res["Pedestrian"]["3d"][difficulty] == pytest.approx(100.0 / 11.0)
    # Cyclist 000001 has occlusion=3 in the reference-written file — above
    # every MAX_OCCLUSION gate, so it is ignored at all difficulties and
    # its matching det absorbs into the ignored GT (no FP): zero curve
    for difficulty in range(3):
        assert res["Cyclist"]["3d"][difficulty] == 0.0
