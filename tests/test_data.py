"""Data subsystem: calib round-trips, preprocessing skip rules, augmentation
invariants, loader determinism — on a synthetic mini-KITTI tree."""

import os
import struct
import zlib

import numpy as np
import pytest

from ssd3d.config import load_cfg
from ssd3d.data import augment as aug
from ssd3d.data.kitti_io import Calibration, KittiScene, read_plane
from ssd3d.data.loader import KittiLoader, MixupDatabase, budget_points
from ssd3d.data.preprocess import preprocess_sample, run_preprocess

from conftest import random_boxes


# ---------------------------------------------------------------------------
# synthetic KITTI tree
# ---------------------------------------------------------------------------

CALIB_TXT = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 44.8 0 700 180 0.1 0 0 1 0.003
P3: 700 0 600 0 0 700 180 0 0 0 1 0
R0_rect: 0.9999 0.0098 -0.0074 -0.0099 0.9999 -0.0043 0.0074 0.0043 0.9999
Tr_velo_to_cam: 0.0076 -0.9999 -0.0006 -0.0027 -0.0022 0.0006 -0.9999 -0.0576 0.9999 0.0076 -0.0022 -0.3321
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""


def _write_png(path, h, w):
    def chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = zlib.compress(b"".join(b"\x00" + b"\x80" * w for _ in range(h)))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", raw))
        f.write(chunk(b"IEND", b""))


@pytest.fixture(scope="module")
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    base = root / "training"
    for sub in ("velodyne", "calib", "label_2", "planes", "image_2"):
        (base / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    n_scans = 4
    for i in range(n_scans):
        (base / "calib" / f"{i:06d}.txt").write_text(CALIB_TXT)
        # KITTI image sizes vary per scan; give scan 1 a different one
        h_px, w_px = (370, 1224) if i == 1 else (375, 1242)
        _write_png(str(base / "image_2" / f"{i:06d}.png"), h_px, w_px)
        (base / "planes" / f"{i:06d}.txt").write_text(
            "# Plane\nWidth 4\nHeight 1\n0 -1 0 1.65\n"
        )
        # velodyne points around known car positions (velo frame: x fwd, y left, z up)
        pts = rng.uniform(0, 1, (6000, 4)).astype(np.float32)
        pts[:, 0] = rng.uniform(5, 60, 6000)  # forward
        pts[:, 1] = rng.uniform(-20, 20, 6000)
        pts[:, 2] = rng.uniform(-1.6, 1.0, 6000)
        # cluster points at the car location (velo ~ (20, 2, -1))
        pts[:400, 0] = rng.uniform(18.5, 21.5, 400)
        pts[:400, 1] = rng.uniform(1.2, 2.8, 400)
        pts[:400, 2] = rng.uniform(-1.5, 0.1, 400)
        pts.tofile(base / "velodyne" / f"{i:06d}.bin")
        # label (rect coords): a car roughly at velo (20, 2, -1) -> rect (-2, 1.6, 20)
        if i < 3:
            label = (
                "Car 0.00 0 -1.58 600.0 180.0 700.0 250.0 "
                "1.6 1.7 4.0 -2.0 1.7 20.0 -1.6\n"
                "DontCare -1 -1 -10 500 170 550 190 -1 -1 -1 -1000 -1000 -1000 -10\n"
            )
        else:
            label = "Misc 0 0 0 0 0 10 10 1 1 1 0 0 30 0\n"  # no fg class
        (base / "label_2" / f"{i:06d}.txt").write_text(label)
    (root / "train.txt").write_text("".join(f"{i:06d}\n" for i in range(n_scans)))
    return root


def test_calib_roundtrip(mini_kitti):
    calib = Calibration.from_file(
        str(mini_kitti / "training" / "calib" / "000000.txt")
    )
    pts = np.random.RandomState(0).uniform(-10, 10, (100, 3)).astype(np.float32)
    pts[:, 0] += 20
    rect = calib.velo_to_rect(pts)
    back = calib.rect_to_velo(rect)
    np.testing.assert_allclose(back, pts, atol=2e-2)  # f32 matmul chain
    # image projection centers near principal point for forward points
    uv = calib.rect_to_image(np.array([[0.0, 0.0, 20.0]]))
    assert abs(uv[0, 0] - 600) < 20 and abs(uv[0, 1] - 180) < 20


def test_preprocess_sample(mini_kitti):
    scene = KittiScene(str(mini_kitti), "training")
    s = preprocess_sample(scene, 0, ["Car"], (-40, 40, -5, 3, 0, 70), True)
    assert s is not None
    assert s["points"].shape[1] == 4
    assert s["boxes_3d"].shape == (1, 7)
    assert (s["sem_labels"] > 0).sum() > 50  # clustered points found inside
    # scan 3 has no foreground class -> skipped
    assert preprocess_sample(
        scene, 3, ["Car"], (-40, 40, -5, 3, 0, 70), True
    ) is None


def test_run_preprocess_and_loader(mini_kitti, tmp_path):
    cfg = load_cfg("/root/repo/configs/kitti/3dssd/3dssd.yaml")
    cfg.DATASET.KITTI.BASE_DIR_PATH = str(mini_kitti)
    cfg.DATASET.KITTI.TRAIN_LIST = str(mini_kitti / "train.txt")
    cfg.DATASET.KITTI.SAVE_NUMPY_PATH = str(tmp_path)
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 2048
    cfg.TRAIN.AUGMENTATIONS.MIXUP.NUMBER = (2,)
    kept = run_preprocess(cfg, "train", log=lambda *a: None)
    assert kept == [0, 1, 2]  # scan 3 skipped (no fg class)
    # mixup DB built
    db_dir = tmp_path / "mixup_database/KITTI" / "train" / "Car"
    assert (db_dir / "list.txt").exists()

    loader = KittiLoader(cfg, "train", training=True, seed=7)
    batch = next(loader.batches(2, epochs=1, num_threads=1))
    assert batch["points"].shape == (2, 2048, 4)
    assert batch["gt_boxes"].shape[0:2] == (2, 64)
    assert (batch["gt_labels"] > 0).any()
    # per-scan true image sizes threaded through (scan 1 is 370x1224)
    for name, size in zip(batch["names"], batch["image_size"]):
        expected = (370, 1224) if int(name) == 1 else (375, 1242)
        assert tuple(size) == expected, (name, size)
    # determinism: same seed -> identical batch
    loader2 = KittiLoader(cfg, "train", training=True, seed=7)
    batch2 = next(loader2.batches(2, epochs=1, num_threads=1))
    np.testing.assert_array_equal(batch["points"], batch2["points"])
    np.testing.assert_array_equal(batch["gt_boxes"], batch2["gt_boxes"])
    # different seed -> different augmentation
    loader3 = KittiLoader(cfg, "train", training=True, seed=8)
    batch3 = next(loader3.batches(2, epochs=1, num_threads=1))
    assert not np.array_equal(batch["points"], batch3["points"])
    # multiprocess path (reference's ZMQ pipeline analog): same contents
    loader4 = KittiLoader(cfg, "train", training=True, seed=7)
    batch4 = next(loader4.batches(2, epochs=1, num_procs=2))
    np.testing.assert_array_equal(batch["points"], batch4["points"])
    np.testing.assert_array_equal(batch["gt_boxes"], batch4["gt_boxes"])
    # sequence-ordered delivery: the batch at iteration k is identical for
    # ANY worker scheme (multi-host correctness depends on this — every
    # process must assemble rows of the same global batch, trainer.py
    # _device_batch); reorder buffers in loader.batches/_batches_mp
    def seq(**kw):
        ld = KittiLoader(cfg, "train", training=True, seed=7)
        return [b["names"].tolist() for b in ld.batches(2, epochs=4, **kw)]

    ref_seq = seq(num_threads=1)
    assert len(ref_seq) == 6
    assert seq(num_threads=4) == ref_seq
    assert seq(num_procs=2) == ref_seq
    # batch-exact resume: start_iter=k yields exactly the tail of the
    # continuous stream (the trainer passes the restored step here, so a
    # killed+resumed run consumes the same batches the unkilled run would)
    assert seq(num_threads=1, start_iter=2) == ref_seq[2:]
    assert seq(num_procs=2, start_iter=3) == ref_seq[3:]
    ld5 = KittiLoader(cfg, "train", training=True, seed=7)
    b5 = next(ld5.batches(2, epochs=4, num_threads=1, start_iter=1))
    ld6 = KittiLoader(cfg, "train", training=True, seed=7)
    it6 = ld6.batches(2, epochs=4, num_threads=1)
    next(it6)
    b6 = next(it6)
    np.testing.assert_array_equal(b5["points"], b6["points"])


def test_budget_points(rng):
    g = np.random.default_rng(0)
    pts = rng.randn(100, 4).astype(np.float32)
    sl = np.arange(100)
    sd = np.ones(100, np.float32)
    p, l, d = budget_points(g, pts, sl, sd, 64)
    assert p.shape == (64, 4) and len(np.unique(l)) == 64  # no replacement
    p2, l2, _ = budget_points(g, pts, sl, sd, 300)
    assert p2.shape == (300, 4)
    assert set(l2[:100]) == set(range(100))  # all points kept before padding


def test_flip_involution(rng):
    boxes = random_boxes(rng, 8)
    pts = rng.randn(50, 4).astype(np.float32)
    p1, b1 = aug.flip_x(pts, boxes)
    p2, b2 = aug.flip_x(p1, b1)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_allclose(np.cos(b2[:, 6]), np.cos(boxes[:, 6]), atol=1e-6)
    np.testing.assert_allclose(np.sin(b2[:, 6]), np.sin(boxes[:, 6]), atol=1e-6)
    # membership preserved under flip
    m0 = aug.points_in_boxes_np(pts, boxes)
    m1 = aug.points_in_boxes_np(p1, b1)
    np.testing.assert_array_equal(m0, m1)


def test_global_rot_scale_keep_membership(rng):
    g = np.random.default_rng(1)
    boxes = random_boxes(rng, 4)
    pts = np.concatenate(
        [boxes[:, :3] + [0, -0.1, 0], rng.randn(20, 3).astype(np.float32)]
    )
    pts = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
    m0 = aug.points_in_boxes_np(pts, boxes)
    p1, b1 = aug.global_rotation(g, pts, boxes, np.pi / 4)
    m1 = aug.points_in_boxes_np(p1, b1)
    assert (m0 != m1).mean() < 0.05
    p2, b2 = aug.global_scale(g, p1, b1, 0.1)
    m2 = aug.points_in_boxes_np(p2, b2)
    assert (m1 != m2).mean() < 0.05


def test_per_object_noise_no_collisions(rng):
    g = np.random.default_rng(2)
    boxes = np.array(
        [[0, 1.5, 10, 4, 1.6, 1.7, 0.0], [8, 1.5, 10, 4, 1.6, 1.7, 0.0]],
        np.float32,
    )
    pts = np.concatenate(
        [
            boxes[0, :3] + rng.uniform(-0.5, 0.5, (30, 3)).astype(np.float32),
            boxes[1, :3] + rng.uniform(-0.5, 0.5, (30, 3)).astype(np.float32),
        ]
    )
    pts[:, 1] -= 0.5
    pts = np.concatenate([pts, np.ones((60, 1), np.float32)], 1)
    sem = np.ones(60, np.int32)
    new_boxes, new_pts = aug.per_object_noise(g, boxes, pts, sem)
    # boxes stayed separated
    corners = aug.bev_corners(new_boxes)
    assert not aug.bev_collision(corners[:1], corners[1:]).any()
    # foreground points moved with their boxes (membership preserved-ish)
    inside = aug.points_in_boxes_np(new_pts, new_boxes, expand=0.1)
    assert inside.any(1).mean() > 0.8


def test_filter_stray_points_matches_reference(rng):
    """filter_points_boxes_3d semantics (voxelnet_aug.py:345): drop
    sem-NEGATIVE points inside any enlarged GT box, keep every positive,
    output ordered positives-then-surviving-negatives; boxes untouched."""
    boxes = random_boxes(rng, 3)
    n = 200
    pts = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    # plant some points inside box 0 / near boxes so the enlargement matters
    pts[:30] = boxes[0, :3] + rng.uniform(-0.4, 0.4, (30, 3))
    pts[:30, 1] = boxes[0, 1] - rng.uniform(0, boxes[0, 4], 30)
    pts[30:50] = boxes[1, :3] + rng.uniform(-1.2, 1.2, (20, 3))
    pts = np.concatenate([pts, np.ones((n, 1), np.float32)], 1)
    strict = aug.points_in_boxes_np(pts, boxes)
    sem = strict.any(1).astype(np.int32) * (strict.argmax(1) + 1)
    dists = rng.uniform(0, 1, n).astype(np.float32)

    out_boxes, out_pts, out_sem, out_dists = aug.filter_stray_points(
        boxes, pts, sem, dists, enlarge_range=(0.5, 2.0, 0.5)
    )
    np.testing.assert_array_equal(out_boxes, boxes)

    # independent brute-force oracle
    enl = boxes.copy()
    enl[:, 3:6] += np.array([0.5, 2.0, 0.5])
    pos_index = np.where(sem >= 1)[0]
    neg_index = np.where(sem == 0)[0]
    neg_inside = aug.points_in_boxes_np(pts[neg_index], enl).any(1)
    order = np.concatenate([pos_index, neg_index[~neg_inside]])
    np.testing.assert_array_equal(out_pts, pts[order])
    np.testing.assert_array_equal(out_sem, sem[order])
    np.testing.assert_array_equal(out_dists, dists[order])
    # the scene must exercise the filter (some negatives dropped, some kept)
    assert 0 < neg_inside.sum() < len(neg_index)
    # every kept negative is outside all enlarged boxes; positives all kept
    assert not aug.points_in_boxes_np(out_pts[out_sem == 0], enl).any()
    assert (out_sem >= 1).sum() == len(pos_index)


def test_mixup_place_snaps_to_plane(rng):
    plane = np.array([0.0, -1.0, 0.0, 1.65])
    scene_boxes = np.array([[0, 1.5, 10, 4, 1.6, 1.7, 0.0]], np.float32)
    samp_boxes = np.array([[15, 0.3, 30, 4, 1.6, 1.7, 0.5]], np.float32)
    samp_pts = [samp_boxes[0, :3] + np.zeros((5, 3), np.float32)]
    samp_pts[0] = np.concatenate([samp_pts[0], np.ones((5, 1), np.float32)], 1)
    pts = np.zeros((10, 4), np.float32)
    boxes, classes, points, sl, sd = aug.mixup_place(
        np.random.default_rng(0), samp_boxes, np.array([1]), samp_pts,
        scene_boxes, np.array([1]), pts, np.zeros(10, np.int32),
        np.ones(10, np.float32), plane,
    )
    assert len(boxes) == 2
    assert boxes[1, 1] == pytest.approx(1.65, abs=1e-5)  # snapped to plane
    # colliding sample is rejected
    coll_boxes = np.array([[0.5, 1.5, 10.2, 4, 1.6, 1.7, 0.2]], np.float32)
    boxes2, *_ = aug.mixup_place(
        np.random.default_rng(0), coll_boxes, np.array([1]), samp_pts,
        scene_boxes, np.array([1]), pts, np.zeros(10, np.int32),
        np.ones(10, np.float32), plane,
    )
    assert len(boxes2) == 1


@pytest.mark.slow
def test_device_aug_loader_and_train_step(mini_kitti, tmp_path):
    """Device-aug mode: loader emits raw scans + fixed-shape mixup candidates;
    the train step augments on device and still converges finitely."""
    import jax
    import jax.numpy as jnp

    from ssd3d.models import build_detector
    from ssd3d.train.train_step import TrainGraph
    from test_model import tiny_cfg

    cfg = tiny_cfg()
    cfg.DATASET.KITTI.BASE_DIR_PATH = str(mini_kitti)
    cfg.DATASET.KITTI.TRAIN_LIST = str(mini_kitti / "train.txt")
    cfg.DATASET.KITTI.SAVE_NUMPY_PATH = str(tmp_path)
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 1024
    cfg.TRAIN.AUGMENTATIONS.OPEN = True
    cfg.TRAIN.AUGMENTATIONS.MIXUP.OPEN = True
    cfg.TRAIN.AUGMENTATIONS.MIXUP.NUMBER = (2,)
    cfg.TPU.DEVICE_AUGMENT = True
    run_preprocess(cfg, "train", log=lambda *a: None)

    loader = KittiLoader(cfg, "train", training=True, seed=3, device_aug=True)
    batch = next(loader.batches(2, epochs=1, num_threads=1))
    assert "cand_points" in batch and "plane" in batch
    assert batch["cand_points"].shape[0] == 2
    assert batch["cand_boxes"].shape[1] == 2  # MIXUP.NUMBER

    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)
    assert graph.aug_cfg is not None
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if k not in ("names", "sem_labels", "calib_P2")}
    state = graph.init_state(jax.random.PRNGKey(0), jb["points"])
    state, metrics = jax.jit(graph.train_step)(state, jb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    # augmentation is stochastic across steps (rng folds in the step count)
    state2, metrics2 = jax.jit(graph.train_step)(state, jb, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics2["total"]))


def test_sharded_batch_eval_matches_batch1(mini_kitti, tmp_path):
    """run_inference_on_split batch_size>1 (batch axis sharded over the
    8 virtual devices, trailing partial batch padded) must produce the
    identical per-scan detections, GT lists, and KITTI dumps as the
    reference-parity batch-1 path."""
    import jax.numpy as jnp

    from ssd3d.eval.predictions import run_inference_on_split

    cfg = load_cfg("/root/repo/configs/kitti/3dssd/3dssd.yaml")
    cfg.DATASET.KITTI.BASE_DIR_PATH = str(mini_kitti)
    cfg.DATASET.KITTI.TRAIN_LIST = str(mini_kitti / "train.txt")
    cfg.DATASET.KITTI.SAVE_NUMPY_PATH = str(tmp_path)
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 1024
    run_preprocess(cfg, "train", log=lambda *a: None)
    scene = KittiScene(str(mini_kitti), "training")

    def fake_infer(variables, points):
        # deterministic per-scan "detections" derived from the points: the
        # plumbing under test is batching/padding/sharding, not the model
        ctr = jnp.mean(points[..., :3], axis=1)  # [bs, 3]
        spread = jnp.std(points[..., :3], axis=1)
        k = 3
        boxes = jnp.stack(
            [jnp.concatenate([ctr + 0.1 * i, spread + 1.0,
                              jnp.mean(points[..., 3:4], axis=1) * (i + 1)],
                             axis=-1) for i in range(k)],
            axis=1,
        )  # [bs, k, 7]
        scores = jnp.stack(
            [jnp.mean(points[..., 3], axis=1) * 0.5 + 0.1 * i
             for i in range(k)], axis=1)
        return {
            "boxes": boxes,
            "scores": scores,
            "classes": jnp.zeros(scores.shape, jnp.int32),
            "valid": scores > 0.15,
        }

    def run(batch_size, save_dir):
        loader = KittiLoader(cfg, "train", training=False, seed=0)
        return run_inference_on_split(
            cfg, fake_infer, ("Car",), {}, loader, scene,
            cls_thresh=0.0, save_dir=save_dir, log=lambda *a: None,
            batch_size=batch_size,
        )

    det1, gt1, names1 = run(1, str(tmp_path / "out1"))
    det8, gt8, names8 = run(8, str(tmp_path / "out8"))  # 3 scans -> padded
    assert names1 == names8 and len(det1) == 3
    for d1, d8 in zip(det1, det8):
        assert len(d1) == len(d8)
        for a, b in zip(d1, d8):
            np.testing.assert_allclose(a.box2d, b.box2d, rtol=1e-5)
            np.testing.assert_allclose(a.t, b.t, rtol=1e-5)
            assert (a.l, a.h, a.w, a.ry, a.score) == (b.l, b.h, b.w, b.ry, b.score)
    assert [len(g) for g in gt1] == [len(g) for g in gt8]
    f1 = sorted(os.listdir(tmp_path / "out1"))
    assert f1 == sorted(os.listdir(tmp_path / "out8"))
    for f in f1:
        assert (tmp_path / "out1" / f).read_text() == \
            (tmp_path / "out8" / f).read_text()


def test_eval_viz_artifacts(mini_kitti, tmp_path):
    """run_inference_on_split(viz_dir=...) dumps a 3D PNG + interactive
    HTML (points/GT/predictions) for the first viz_scans scans — the
    evaluator-side stand-in for the reference's mayavi debugging."""
    import jax.numpy as jnp

    from ssd3d.eval.predictions import run_inference_on_split

    cfg = load_cfg("/root/repo/configs/kitti/3dssd/3dssd.yaml")
    cfg.DATASET.KITTI.BASE_DIR_PATH = str(mini_kitti)
    cfg.DATASET.KITTI.TRAIN_LIST = str(mini_kitti / "train.txt")
    cfg.DATASET.KITTI.SAVE_NUMPY_PATH = str(tmp_path)
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 1024
    run_preprocess(cfg, "train", log=lambda *a: None)
    scene = KittiScene(str(mini_kitti), "training")

    def fake_infer(variables, points):
        ctr = jnp.mean(points[..., :3], axis=1)
        spread = jnp.std(points[..., :3], axis=1)
        boxes = jnp.concatenate([ctr, spread + 1.0,
                                 jnp.zeros_like(ctr[:, :1])], -1)[:, None]
        scores = jnp.ones(boxes.shape[:2], jnp.float32)
        return {"boxes": boxes, "scores": scores,
                "classes": jnp.zeros(scores.shape, jnp.int32),
                "valid": scores > 0.0}

    loader = KittiLoader(cfg, "train", training=False, seed=0)
    viz = tmp_path / "viz"
    run_inference_on_split(
        cfg, fake_infer, ("Car",), {}, loader, scene,
        cls_thresh=0.0, log=lambda *a: None,
        viz_dir=str(viz), viz_scans=2,
    )
    pngs = sorted(p for p in os.listdir(viz) if p.endswith(".png"))
    htmls = sorted(p for p in os.listdir(viz) if p.endswith(".html"))
    assert len(pngs) == 2 and len(htmls) == 2
    assert (viz / pngs[0]).read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    assert "const PTS=" in (viz / htmls[0]).read_text()


# ---------------------------------------------------------------------------
# heading-asymmetric synthetic shells (the AOS falsifier)
# ---------------------------------------------------------------------------

def _local_frame(pts, box):
    """Points -> (px, pz, hy) in the box's local frame; hy in [0,1], 1=roof."""
    x, y, z, l, h, w, ry = box
    c, s = np.cos(ry), np.sin(ry)
    rx, rz = pts[:, 0] - x, pts[:, 2] - z
    px = c * rx - s * rz
    pz = s * rx + c * rz
    hy = -(pts[:, 1] - y) / h
    return px, pz, hy


def test_synth_car_points_heading_asymmetric():
    """The generator's shells must be heading-asymmetric — otherwise AOS is
    unlearnable and pins at ~0.5x image AP (the round-3 failure mode)."""
    sys_path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "tools"))
    import sys
    sys.path.insert(0, sys_path)
    from synth_kitti import car_points

    rng = np.random.default_rng(0)
    box = np.array([4.0, 1.65, 20.0, 3.9, 1.56, 1.6, 0.7], np.float32)
    pts = car_points(rng, box, 4000)
    px, pz, hy = _local_frame(pts, box)
    l = box[3]
    front, rear = px > 0.15 * l, px < -0.15 * l
    # hood: front points are crushed low; rear keeps the full cabin
    assert hy[front].max() < 0.55
    assert hy[rear].max() > 0.85
    # dense front wall vs rear wall
    n_fw = np.sum(px > 0.45 * l)
    n_rw = np.sum(px < -0.45 * l)
    assert n_fw > 1.5 * n_rw


def test_flip_x_keeps_heading_geometry_consistent():
    """After the x-flip augmentation (ry -> pi - ry), the flipped label must
    still describe the flipped geometry: the hood stays on the box's local
    +x (heading) side. A wrong mirror convention flips the label but not
    the shape (or vice versa) and this inverts."""
    import sys
    sys.path.insert(0, os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "tools")))
    from synth_kitti import car_points

    rng = np.random.default_rng(1)
    for ry in (-2.5, -0.9, 0.0, 0.7, 2.9):
        box = np.array([3.0, 1.65, 15.0, 3.9, 1.56, 1.6, ry], np.float32)
        pts4 = np.concatenate(
            [car_points(rng, box, 3000), np.zeros((3000, 1), np.float32)], 1)
        fpts, fbox = aug.flip_x(pts4, box[None])
        px, pz, hy = _local_frame(fpts[:, :3], fbox[0])
        l = box[3]
        front, rear = px > 0.15 * l, px < -0.15 * l
        assert hy[front].max() < 0.55, f"hood lost after flip at ry={ry}"
        assert hy[rear].max() > 0.85, f"cabin lost after flip at ry={ry}"
