"""nuScenes path: casts, sweep aggregation, voxel budget, velocity/attribute
heads + losses, and the native mAP/NDS metric."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd3d.config import load_cfg
from ssd3d.data.nuscenes import (
    NuScenesLoader,
    aggregate_sweeps,
    cast_boxes_to_kitti,
    cast_points_to_kitti,
    voxel_budget_sample,
)
from ssd3d.eval.nuscenes_eval import NuscBox, evaluate_nuscenes


def test_casts_consistent(rng):
    """Points inside a nuScenes box stay inside after both casts."""
    from ssd3d.data.augment import points_in_boxes_np

    box_nusc = np.array([[5.0, 10.0, 0.5, 1.9, 4.6, 1.7, 0.7]], np.float32)
    # points near the box center in nuScenes frame
    pts = np.array([[5.0, 10.0, 0.5], [5.3, 10.5, 0.6]], np.float32)
    box_k = cast_boxes_to_kitti(box_nusc)
    pts_k = cast_points_to_kitti(pts.copy())
    assert points_in_boxes_np(pts_k, box_k).all()
    # bottom-face convention: y_bottom = -(z_center) + h/2
    assert box_k[0, 1] == pytest.approx(-0.5 + 1.7 / 2)
    assert box_k[0, 3] == pytest.approx(4.6)  # l
    assert box_k[0, 4] == pytest.approx(1.7)  # h
    assert box_k[0, 5] == pytest.approx(1.9)  # w


def test_aggregate_sweeps(rng):
    key = rng.rand(100, 4).astype(np.float32) * 10
    sweep_pts = rng.rand(50, 4).astype(np.float32) * 10
    rot = np.eye(3, dtype=np.float32)
    merged, key_num = aggregate_sweeps(
        key, key_ts=10.0,
        sweeps=[{"points": sweep_pts, "rotation": rot,
                 "translation": np.array([1.0, 0, 0]), "timestamp": 9.5}],
        feature_channels=4,
    )
    assert merged.shape == (150, 4)
    assert key_num == 100
    assert np.allclose(merged[:100, 3], 0.0)  # key frame Δt = 0
    assert np.allclose(merged[100:, 3], 0.5)  # sweep Δt
    # sweep translated by +1 in nuScenes x (stays x after cast)
    assert np.allclose(
        merged[100:, 0], cast_points_to_kitti(sweep_pts.copy())[:, 0] + 1.0,
        atol=1e-5,
    )


def test_voxel_budget_sample(rng):
    g = np.random.default_rng(0)
    # 1000 points piled into one voxel + 200 spread out
    pile = np.zeros((1000, 4), np.float32) + 0.05
    spread = np.concatenate(
        [g.uniform(-40, 40, (200, 1)), g.uniform(-1, 1, (200, 1)),
         g.uniform(-40, 40, (200, 1)), np.zeros((200, 1))], axis=1
    ).astype(np.float32)
    pts = np.concatenate([pile, spread])
    out = voxel_budget_sample(
        g, pts, (0.2, 0.2, 0.2), (-50, 50, -5, 3, -50, 50),
        max_per_voxel=10, budget=128, priority_num=0,
    )
    assert out.shape == (128, 4)
    # density cap: at most 10 of the piled points survive the voxel cap
    n_piled = (np.abs(out[:, 0] - 0.05) < 1e-6).sum()
    assert n_piled <= 10


@pytest.fixture(scope="module")
def nusc_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc")
    rng = np.random.RandomState(0)
    names = []
    for i in range(3):
        pts = rng.uniform(-1, 1, (5000, 4)).astype(np.float32) * np.array(
            [40, 2, 40, 1], np.float32
        )
        boxes = np.array(
            [[5.0, 1.2, 10.0, 4.6, 1.7, 1.9, 0.4],
             [-8.0, 1.0, -12.0, 0.7, 1.8, 0.7, -0.2]], np.float32
        )
        classes = np.array(["car", "pedestrian"])
        np.savez(
            root / f"sample{i}.npz", points=pts, key_points_num=3000,
            boxes_3d=boxes, classes=classes,
            velocity=np.array([[1.0, 0.2], [0.1, 0.0]], np.float32),
            attributes=np.array([0, 5], np.int32),
        )
        names.append(f"sample{i}")
    (root / "list.txt").write_text("".join(n + "\n" for n in names))
    return root


@pytest.mark.slow
def test_nuscenes_loader_and_model(nusc_env):
    cfg = load_cfg("/root/repo/configs/nuscenes/3dssd/3dssd.yaml")
    cfg.DATASET.NUSCENES.MAX_CUR_SAMPLE_POINTS_NUM = 512
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 512
    # shrink the backbone for CPU
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    for layer, npt in zip(arch, [[128], [32], [16, 0], None, None, [16]]):
        if npt is not None and layer[11] == "SA_Layer":
            layer[8] = npt
        if layer[11] == "SA_Layer":
            layer[4] = [[8, 8]] * len(layer[2]) if layer[2] else []
            layer[3] = [4] * len(layer[2])
            layer[15] = 16 if layer[15] != -1 else -1
    arch[2][6] = [32, -1]
    arch[3][6] = [16, -1]
    arch[3][8] = [16, 0]
    arch[4][4] = [8]

    loader = NuScenesLoader(cfg, "train", data_dir=str(nusc_env), seed=0)
    batch = next(loader.batches(2, epochs=1))
    assert batch["points"].shape == (2, 512, 4)
    assert batch["gt_velocity"].shape[-1] == 2
    assert (batch["gt_labels"] > 0).sum() == 4  # 2 boxes x 2 samples

    from ssd3d.models import build_detector
    from ssd3d.train.train_step import TrainGraph

    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)
    assert len(spec.cls_list) == 10
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "names"}
    state = graph.init_state(jax.random.PRNGKey(0), jb["points"])
    state, metrics = jax.jit(graph.train_step)(state, jb, jax.random.PRNGKey(1))
    assert {"attribute", "velocity"} <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # inference emits attribute/velocity-capable detections
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jb["points"], False,
    )
    assert out["velocity"].shape[-1] == 2
    assert out["attribute"].shape[-1] == 8
    det = spec.decode_and_nms(out)
    k = cfg.MODEL.FIRST_STAGE.MAX_OUTPUT_NUM * 10
    assert det["boxes"].shape == (2, k, 7)
    # auxiliary heads ride through NMS via the source-point index
    assert det["velocity"].shape == (2, k, 2)
    assert det["attribute"].shape == (2, k, 8)
    np.testing.assert_array_equal(
        np.asarray(det["velocity"]),
        np.asarray(out["velocity"])[
            np.arange(2)[:, None], np.asarray(det["index"]), 0
        ],
    )


def _mkbox(cls, x, z, ry=0.0, vel=(0, 0), attr=0, score=-1.0):
    return NuscBox(
        cls=cls, center=np.array([x, 1.0, z]),
        size=np.array([4.0, 1.6, 1.8]), ry=ry,
        velocity=np.asarray(vel, np.float64), attribute=attr, score=score,
    )


def test_nusc_metric_perfect():
    gts, dets = [], []
    rng = np.random.RandomState(0)
    for i in range(30):
        frame = [_mkbox("car", rng.uniform(-30, 30), rng.uniform(-30, 30),
                        ry=rng.uniform(-3, 3), vel=rng.randn(2))
                 for _ in range(3)]
        gts.append(frame)
        dets.append([
            NuscBox(b.cls, b.center, b.size, b.ry, b.velocity, b.attribute,
                    score=rng.rand()) for b in frame
        ])
    res = evaluate_nuscenes(gts, dets, ["car"])
    assert res["mAP"] > 0.95
    assert res["NDS"] > 0.95
    assert res["per_class"]["car"]["trans"] < 1e-6


def test_nusc_metric_degrades():
    gts, dets = [], []
    rng = np.random.RandomState(0)
    for i in range(30):
        frame = [_mkbox("car", rng.uniform(-30, 30), rng.uniform(-30, 30))
                 for _ in range(3)]
        gts.append(frame)
        dets.append([
            NuscBox(b.cls, b.center + np.array([1.5, 0, 0]), b.size,
                    b.ry + 0.3, b.velocity + 1.0, b.attribute,
                    score=rng.rand()) for b in frame
        ])
    res = evaluate_nuscenes(gts, dets, ["car"])
    perfect = 1.0
    assert 0.2 < res["mAP"] < perfect  # misses the 0.5 m and 1 m thresholds
    assert res["per_class"]["car"]["trans"] == pytest.approx(1.5, abs=0.01)
    assert res["per_class"]["car"]["orient"] == pytest.approx(0.3, abs=0.01)
    assert res["NDS"] < 0.9


def test_nusc_metric_worked_example_exact():
    """Hand-computed fixture for the full CVPR-2019 protocol math: one
    frame, 3 GT cars, 2 detections (D0 at 0.4 m / score .9, D1 at 0.9 m /
    score .8 with half-length size, 0.3 rad yaw error and unit velocity
    error split across the two), one GT undetected.

    Derivation (101-point recall grid, thresholds {.5,1,2,4} m):
    - th=0.5: only D0 matches -> recall [1/3,1/3], precision [1,.5];
      interpolated curve = 1.0 for r<1/3, 0 beyond ->
      AP = 23*0.9/90/0.9 = 23/90.
    - th in {1,2,4}: both match -> precision 1 up to recall 2/3 ->
      AP = 56/90 (grid points 11..66).
    - TP errors at 2 m: cummean curves over confidence
      trans [0.4,0.65], scale [0,0.25], orient [0.3,0.15], vel [1,0.5],
      attr [0,0.5]; conf curve 0.9 flat to r=1/3 then linear to 0.8 at
      r=2/3, zero after; max-recall index 66 -> mean over grid 11..66:
      err = cm1 + (cm2-cm1)*16.5/56 (sum of (r_i-1/3) over i=34..66 is 5.5,
      scaled by 3 for the 1/3-wide segment).
    - NDS = (5*mAP + sum max(0,1-err))/10.
    """
    size = np.array([4.0, 1.5, 2.0])
    half = np.array([2.0, 1.5, 2.0])

    def box(x, sz=size, ry=0.0, vel=(0, 0), attr=0, score=-1.0):
        return NuscBox("car", np.array([x, 1.0, 0.0]), sz, ry,
                       np.asarray(vel, float), attr, score)

    gts = [[box(0.0), box(10.0), box(30.0)]]
    dets = [[
        box(0.4, ry=0.3, vel=(1, 0), attr=0, score=0.9),      # D0 -> G0
        box(10.9, sz=half, vel=(0, 0), attr=1, score=0.8),    # D1 -> G1
    ]]
    res = evaluate_nuscenes(gts, dets, ["car"])

    ap_05 = 23 * 0.9 / 90.0 / 0.9
    ap_rest = 56 / 90.0
    np.testing.assert_allclose(
        res["per_class"]["car"]["ap"], [ap_05, ap_rest, ap_rest, ap_rest],
        atol=1e-12,
    )
    mAP = (ap_05 + 3 * ap_rest) / 4.0
    assert res["mAP"] == pytest.approx(mAP, abs=1e-12)

    k = 16.5 / 56.0
    expected = {
        "trans": 0.4 + 0.25 * k,
        "scale": 0.0 + 0.25 * k,
        "orient": 0.3 - 0.15 * k,
        "vel": 1.0 - 0.5 * k,
        "attr": 0.0 + 0.5 * k,
    }
    for key, val in expected.items():
        assert res["per_class"]["car"][key] == pytest.approx(val, abs=1e-12), key
    nds = (5 * mAP + sum(max(0.0, 1.0 - v) for v in expected.values())) / 10.0
    assert res["NDS"] == pytest.approx(nds, abs=1e-12)


def test_nusc_metric_perfect_exact():
    """GT == detections at distinct scores: every curve saturates ->
    AP exactly 1 at every threshold, every TP error exactly 0, NDS 1."""
    frame = [
        NuscBox("car", np.array([x, 1.0, 0.0]), np.array([4, 1.5, 2.0]),
                0.5, np.array([1.0, 0.0]), 0)
        for x in np.arange(0, 100, 10.0)
    ]
    dets = [[dataclasses_replace_score(b, 1.0 - 0.05 * i)
             for i, b in enumerate(frame)]]
    res = evaluate_nuscenes([frame], dets, ["car"])
    np.testing.assert_allclose(res["per_class"]["car"]["ap"], [1.0] * 4,
                               atol=1e-12)
    for key in ("trans", "scale", "orient", "vel", "attr"):
        assert res["per_class"]["car"][key] == 0.0, key
    assert res["mAP"] == pytest.approx(1.0, abs=1e-12)
    assert res["NDS"] == pytest.approx(1.0, abs=1e-12)


def test_nusc_metric_class_exceptions():
    """traffic_cone reports no orientation/velocity/attribute error and
    barrier no velocity/attribute (devkit aggregation exceptions); barrier
    yaw uses period pi (a pi flip is a perfect orientation match)."""
    cone = NuscBox("traffic_cone", np.zeros(3), np.ones(3), 0.0)
    barrier = NuscBox("barrier", np.array([10.0, 0, 0]), np.ones(3), 0.0)
    dets = [[
        dataclasses_replace_score(cone, 0.9),
        NuscBox("barrier", np.array([10.0, 0, 0]), np.ones(3),
                np.pi, score=0.8),
    ]]
    res = evaluate_nuscenes([[cone, barrier]], dets,
                            ["traffic_cone", "barrier"])
    for key in ("orient", "vel", "attr"):
        assert key not in res["per_class"]["traffic_cone"]
    for key in ("vel", "attr"):
        assert key not in res["per_class"]["barrier"]
    assert res["per_class"]["barrier"]["orient"] == pytest.approx(0.0, abs=1e-9)


def dataclasses_replace_score(b: NuscBox, score: float) -> NuscBox:
    return NuscBox(b.cls, b.center, b.size, b.ry, b.velocity, b.attribute,
                   score)


def _write_raw_nusc_tree(root):
    """Minimal raw nuScenes v1.0 tree: 1 scene, 2 key frames, 1 sweep, one
    moving car annotated in both frames. Key poses: frame 1 at the global
    origin, frame 2 translated +2 m in x; the sweep sits at +1 m."""
    import json

    version_dir = os.path.join(root, "v1.0-test")
    os.makedirs(version_dir)
    os.makedirs(os.path.join(root, "samples/LIDAR_TOP"))
    os.makedirs(os.path.join(root, "sweeps/LIDAR_TOP"))
    qid = [1.0, 0.0, 0.0, 0.0]

    def dump(name, recs):
        with open(os.path.join(version_dir, f"{name}.json"), "w") as f:
            json.dump(recs, f)

    def bin_pts(rel, pts):
        arr = np.zeros((len(pts), 5), np.float32)
        arr[:, :3] = pts
        arr[:, 3] = 128.0  # intensity
        arr.tofile(os.path.join(root, rel))

    bin_pts("samples/LIDAR_TOP/k1.bin", [[10.0, 0.0, 1.0], [0.0, 5.0, 0.0]])
    bin_pts("samples/LIDAR_TOP/k2.bin", [[10.0, 0.0, 1.0]])
    bin_pts("sweeps/LIDAR_TOP/s1.bin", [[0.0, 0.0, 0.0]])

    dump("sensor", [{"token": "SEN", "channel": "LIDAR_TOP"}])
    dump("calibrated_sensor", [{"token": "CS", "sensor_token": "SEN",
                                "rotation": qid, "translation": [0, 0, 0]}])
    dump("ego_pose", [
        {"token": "EP1", "rotation": qid, "translation": [0, 0, 0]},
        {"token": "EP2", "rotation": qid, "translation": [2, 0, 0]},
        {"token": "EPS", "rotation": qid, "translation": [1, 0, 0]},
    ])
    dump("scene", [{"token": "SC", "name": "scene-0001",
                    "first_sample_token": "S1"}])
    dump("sample", [
        {"token": "S1", "timestamp": 0, "prev": "", "next": "S2",
         "scene_token": "SC"},
        {"token": "S2", "timestamp": 500000, "prev": "S1", "next": "",
         "scene_token": "SC"},
    ])
    dump("sample_data", [
        {"token": "SD1", "sample_token": "S1", "ego_pose_token": "EP1",
         "calibrated_sensor_token": "CS", "is_key_frame": True,
         "filename": "samples/LIDAR_TOP/k1.bin", "prev": "", "next": "SDS",
         "timestamp": 0},
        {"token": "SDS", "sample_token": "S2", "ego_pose_token": "EPS",
         "calibrated_sensor_token": "CS", "is_key_frame": False,
         "filename": "sweeps/LIDAR_TOP/s1.bin", "prev": "SD1", "next": "SD2",
         "timestamp": 250000},
        {"token": "SD2", "sample_token": "S2", "ego_pose_token": "EP2",
         "calibrated_sensor_token": "CS", "is_key_frame": True,
         "filename": "samples/LIDAR_TOP/k2.bin", "prev": "SDS", "next": "",
         "timestamp": 500000},
    ])
    dump("category", [{"token": "CAT", "name": "vehicle.car"}])
    dump("attribute", [{"token": "ATT", "name": "vehicle.moving"}])
    dump("instance", [{"token": "INST", "category_token": "CAT"}])
    # car at global (10, 0, 1) in S1 moving to (12, 0, 1) in S2 -> 4 m/s in x
    dump("sample_annotation", [
        {"token": "A1", "sample_token": "S1", "instance_token": "INST",
         "attribute_tokens": ["ATT"], "translation": [10, 0, 1],
         "size": [1.9, 4.6, 1.7], "rotation": qid, "prev": "", "next": "A2",
         "num_lidar_pts": 5, "num_radar_pts": 0},
        {"token": "A2", "sample_token": "S2", "instance_token": "INST",
         "attribute_tokens": ["ATT"], "translation": [12, 0, 1],
         "size": [1.9, 4.6, 1.7], "rotation": qid, "prev": "A1", "next": "",
         "num_lidar_pts": 5, "num_radar_pts": 0},
    ])
    return version_dir


def test_convert_raw_nuscenes(tmp_path):
    """Devkit-free raw converter: sweep transform, dt channel, box cast,
    finite-difference velocity, attribute index, split lists."""
    from ssd3d.data.nuscenes import convert_raw_nuscenes

    root = str(tmp_path / "raw")
    os.makedirs(root)
    _write_raw_nusc_tree(root)
    out = str(tmp_path / "npz")
    lists = convert_raw_nuscenes("v1.0-test", root, out, nsweeps=10,
                                 feature_channels=5, log=lambda *a: None)
    # scene index 0 -> val by the default every-5th rule
    assert lists["val"] == ["S1", "S2"] and lists["train"] == []

    d1 = np.load(os.path.join(out, "val", "S1.npz"), allow_pickle=True)
    # frame 1: no sweeps; 2 key points cast (x,y,z)->(x,-z,y)
    assert int(d1["key_points_num"]) == 2
    np.testing.assert_allclose(
        d1["points"][:, :3], [[10, -1, 0], [0, 0, 5]], atol=1e-5)
    np.testing.assert_allclose(d1["points"][:, 3], 128 / 255.0, atol=1e-6)
    np.testing.assert_allclose(d1["points"][:, 4], 0.0)  # key-frame dt
    # box: global == sensor frame here; cast to (x, y_bottom, z, l, h, w, ry)
    np.testing.assert_allclose(
        d1["boxes_3d"][0], [10, -1 + 1.7 / 2, 0, 4.6, 1.7, 1.9, 0], atol=1e-5)
    assert str(d1["classes"][0]) == "car"
    np.testing.assert_allclose(d1["velocity"][0], [4.0, 0.0], atol=1e-5)
    assert d1["attributes"][0] == 0  # vehicle.moving

    d2 = np.load(os.path.join(out, "val", "S2.npz"), allow_pickle=True)
    # frame 2 key pose is +2 m: its sweep (pose +1 m, local origin point)
    # lands at key-frame x = -1 -> cast (-1, 0, 0); dt = 0.25 s
    assert int(d2["key_points_num"]) == 1
    sweep_rows = d2["points"][1:]
    np.testing.assert_allclose(sweep_rows[0, :3], [-1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(sweep_rows[0, 4], 0.25, atol=1e-6)
    # box at global (12,0,1) -> key frame (10,0,1)
    np.testing.assert_allclose(d2["boxes_3d"][0][:3], [10, -1 + 1.7 / 2, 0],
                               atol=1e-5)

    # the loader consumes the converted tree directly
    cfg = load_cfg("configs/nuscenes/3dssd/3dssd.yaml")
    cfg.DATASET.NUSCENES.INPUT_FEATURE_CHANNEL = 5
    loader = NuScenesLoader(cfg, "val", data_dir=os.path.join(out, "val"),
                            training=False)
    sample = loader.load_sample(0)
    assert sample["points"].shape == (16384, 5)
    assert sample["gt_labels"][0] == 1  # car is class 1 in CLS_LIST
    np.testing.assert_allclose(sample["gt_velocity"][0], [4, 0], atol=1e-5)


def test_nusc_sharded_batch_eval_matches_batch1(nusc_env, tmp_path):
    """nuScenes analogue of test_data.test_sharded_batch_eval_matches_batch1:
    batch_size>1 (sharded over the 8 virtual devices, trailing batch
    padded) must produce identical NuscBox lists and submission JSON."""
    import json

    import jax.numpy as jnp

    from ssd3d.eval import nuscenes_predictions as nusc

    cfg = load_cfg("/root/repo/configs/nuscenes/3dssd/3dssd.yaml")
    cfg.DATASET.NUSCENES.MAX_CUR_SAMPLE_POINTS_NUM = 512
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 512

    def fake_infer(variables, points):
        ctr = jnp.mean(points[..., :3], axis=1)
        spread = jnp.std(points[..., :3], axis=1)
        k = 2
        boxes = jnp.stack(
            [jnp.concatenate([ctr + i, spread + 1.0,
                              jnp.mean(points[..., 3:4], axis=1)], axis=-1)
             for i in range(k)], axis=1)
        scores = jnp.stack(
            [jnp.abs(jnp.mean(points[..., 3], axis=1)) + 0.1 * i
             for i in range(k)], axis=1)
        return {
            "boxes": boxes,
            "scores": scores,
            "classes": jnp.zeros(scores.shape, jnp.int32),
            "valid": scores > 0.0,
            "velocity": boxes[..., :2] * 0.1,
            "attribute": jnp.ones(scores.shape, jnp.int32),
        }

    cls_list = tuple(cfg.DATASET.NUSCENES.CLS_LIST)

    def run(batch_size, save):
        loader = NuScenesLoader(cfg, "train", data_dir=str(nusc_env), seed=0)
        return nusc.run_inference_on_split(
            cfg, fake_infer, cls_list, {}, loader,
            cls_thresh=0.0, save_path=save, log=lambda *a: None,
            batch_size=batch_size,
        )

    d1, g1, n1 = run(1, str(tmp_path / "r1.json"))
    d8, g8, n8 = run(8, str(tmp_path / "r8.json"))  # 3 frames -> padded
    assert n1 == n8 and len(d1) == 3
    for a_list, b_list in zip(d1, d8):
        assert len(a_list) == len(b_list)
        for a, b in zip(a_list, b_list):
            np.testing.assert_allclose(a.center, b.center, rtol=1e-5)
            np.testing.assert_allclose(a.size, b.size, rtol=1e-5)
            assert (a.cls, a.attribute) == (b.cls, b.attribute)
            np.testing.assert_allclose(a.score, b.score, rtol=1e-6)
    assert [len(g) for g in g1] == [len(g) for g in g8]
    assert json.load(open(tmp_path / "r1.json")) == \
        json.load(open(tmp_path / "r8.json"))


@pytest.mark.slow
def test_nuscenes_train_step_sharded_multichip(nusc_env):
    """The nuScenes train step — velocity/attribute losses included —
    compiled and executed over an 8-device mesh with the batch sharded on
    'data'; losses must match the single-device run on the same batch
    (nuScenes intent: nuscenes_dataloader.py:182-257; §2.7 DP strategy)."""
    from ssd3d.models import build_detector
    from ssd3d.parallel import batch_sharding, make_mesh, replicated
    from ssd3d.train.train_step import TrainGraph

    cfg = load_cfg("/root/repo/configs/nuscenes/3dssd/3dssd.yaml")
    cfg.DATASET.NUSCENES.MAX_CUR_SAMPLE_POINTS_NUM = 512
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 512
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    for layer, npt in zip(arch, [[128], [32], [16, 0], None, None, [16]]):
        if npt is not None and layer[11] == "SA_Layer":
            layer[8] = npt
        if layer[11] == "SA_Layer":
            layer[4] = [[8, 8]] * len(layer[2]) if layer[2] else []
            layer[3] = [4] * len(layer[2])
            layer[15] = 16 if layer[15] != -1 else -1
    arch[2][6] = [32, -1]
    arch[3][6] = [16, -1]
    arch[3][8] = [16, 0]
    arch[4][4] = [8]

    loader = NuScenesLoader(cfg, "train", data_dir=str(nusc_env), seed=0)
    batch = next(loader.batches(2, epochs=1))  # env has 3 samples; tile to 8
    jb = {
        k: jnp.concatenate([jnp.asarray(v)] * 4, axis=0)
        for k, v in batch.items() if k != "names"
    }

    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)
    state = graph.init_state(jax.random.PRNGKey(0), jb["points"][:1])

    st_1, m_1 = jax.jit(graph.train_step)(state, jb, jax.random.PRNGKey(1))
    assert {"attribute", "velocity"} <= set(m_1)

    mesh = make_mesh(8)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    sh_batch = {k: jax.device_put(v, bsh) for k, v in jb.items()}
    step = jax.jit(
        graph.train_step,
        in_shardings=(rep, {k: bsh for k in sh_batch}, rep),
        out_shardings=(rep, rep),
    )
    st_8, m_8 = step(jax.device_put(state, rep), sh_batch,
                     jax.random.PRNGKey(1))
    assert int(st_8.step) == 1
    # vs single device: LOOSE — per-example kernels vectorize differently
    # at per-device batch 1, and the untrained model's near-uniform scores
    # let argmax/assignment ties flip on those ULPs (measured 0.3% on cls);
    # the tight cross-check is fsdp-vs-dp below (same topology)
    for k in m_1:
        a, b = float(m_1[k]), float(m_8[k])
        assert np.isfinite(b), (k, b)
        if k in ("grad_norm", "param_norm"):
            # gradient-derived: identical losses can route gradient
            # through different duplicate indices when ties flip, so
            # these are not comparable across partitionings
            continue
        np.testing.assert_allclose(b, a, rtol=2e-2, atol=1e-4, err_msg=k)
    # Gradients/params are NOT compared against the single-device run:
    # discrete selections (FPS ties, target assignment) can flip on
    # reduction-order ULPs and reroute identical losses through different
    # indices — loss equality is the sharding-correctness signal. FSDP on
    # the same mesh must agree with dp tightly (same topology).
    from ssd3d.parallel import fsdp_shardings

    state_sh = fsdp_shardings(state, mesh, min_size=1 << 8)
    assert any(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(state_sh)
    )
    step_f = jax.jit(
        graph.train_step,
        in_shardings=(state_sh, {k: bsh for k in sh_batch}, rep),
        out_shardings=(state_sh, rep),
    )
    st_f, m_f = step_f(jax.device_put(state, state_sh), sh_batch,
                       jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_f["total"]), float(m_8["total"]),
                               rtol=1e-5)
    assert int(st_f.step) == 1
