"""On-device augmentation: invariants mirroring the host-side tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd3d.config import get_default_cfg
from ssd3d.train import device_aug as da
from ssd3d.data.augment import points_in_boxes_np

from conftest import random_boxes


def test_flip_branch(rng):
    pts = jnp.asarray(rng.randn(50, 4).astype(np.float32))
    boxes = jnp.asarray(random_boxes(rng, 4))
    # key chosen so the flip triggers
    for seed in range(6):
        p, b = da.flip_x(jax.random.PRNGKey(seed), pts, boxes)
        if not np.allclose(np.asarray(p), np.asarray(pts)):
            m0 = points_in_boxes_np(np.asarray(pts), np.asarray(boxes))
            m1 = points_in_boxes_np(np.asarray(p), np.asarray(b))
            np.testing.assert_array_equal(m0, m1)
            return
    pytest.fail("flip never triggered across seeds")


def test_global_transforms_preserve_membership(rng):
    boxes = random_boxes(rng, 4)
    pts = np.concatenate(
        [boxes[:, :3] + [0, -0.2, 0], rng.randn(30, 3).astype(np.float32)]
    ).astype(np.float32)
    pts = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
    p, b = da.global_rotation(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(boxes), np.pi / 4
    )
    m0 = points_in_boxes_np(pts, boxes)
    m1 = points_in_boxes_np(np.asarray(p), np.asarray(b))
    assert (m0 != m1).mean() < 0.05
    p2, b2 = da.global_scale(jax.random.PRNGKey(1), p, b, 0.1)
    m2 = points_in_boxes_np(np.asarray(p2), np.asarray(b2))
    assert (m1 != m2).mean() < 0.05


def test_per_object_noise_no_new_collisions(rng):
    boxes = np.zeros((8, 7), np.float32)
    boxes[0] = [0, 1.5, 10, 4, 1.6, 1.7, 0.0]
    boxes[1] = [10, 1.5, 10, 4, 1.6, 1.7, 0.0]
    pts = np.concatenate([
        boxes[0, :3] + rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32),
        boxes[1, :3] + rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32),
    ])
    pts[:, 1] -= 0.5
    pts = np.concatenate([pts, np.ones((80, 1), np.float32)], 1)
    p, b = da.per_object_noise(
        jax.random.PRNGKey(3), jnp.asarray(pts), jnp.asarray(boxes)
    )
    b = np.asarray(b)
    from ssd3d.core.iou import boxes_iou_bev_3d

    iou, _ = boxes_iou_bev_3d(jnp.asarray(b[:2]), jnp.asarray(b[:2]))
    assert float(iou[0, 1]) < 1e-6  # still separated
    # interior points moved with the boxes
    inside = points_in_boxes_np(np.asarray(p), b[:2], expand=0.2)
    assert inside.any(1).mean() > 0.7
    # a box actually moved (noise applied)
    assert not np.allclose(b[:2], boxes[:2])


def test_paste_gt_samples(rng):
    points = jnp.asarray(rng.randn(256, 4).astype(np.float32) * 20)
    gt = np.zeros((8, 7), np.float32)
    gt[0] = [0, 1.5, 10, 4, 1.6, 1.7, 0.0]
    labels = np.zeros(8, np.int32)
    labels[0] = 1
    cand_boxes = np.array([
        [15.0, 0.2, 30.0, 4, 1.6, 1.7, 0.3],   # free spot -> accept
        [0.3, 0.2, 10.2, 4, 1.6, 1.7, 0.1],    # collides with gt[0] -> reject
    ], np.float32)
    cand_points = np.tile(
        cand_boxes[:, None, :3], (1, 16, 1)
    ).astype(np.float32)
    cand_points = np.concatenate(
        [cand_points, np.ones((2, 16, 1), np.float32)], -1
    )
    plane = jnp.asarray([0.0, -1.0, 0.0, 1.65])
    p, b, l = da.paste_gt_samples(
        jax.random.PRNGKey(0), points, jnp.asarray(gt), jnp.asarray(labels),
        jnp.asarray(cand_points), jnp.asarray(cand_boxes),
        jnp.asarray(np.array([2, 2], np.int32)),
        jnp.asarray(np.array([True, True])), plane,
    )
    b, l = np.asarray(b), np.asarray(l)
    live = np.any(b != 0, axis=-1)
    assert live.sum() == 2  # original + 1 accepted
    placed = b[1]
    assert placed[1] == pytest.approx(1.65, abs=1e-4)  # snapped to plane
    assert l[1] == 2
    # crop points were written into the cloud (snapped y too)
    p = np.asarray(p)
    hits = np.isclose(p[:, 0], 15.0, atol=1e-4).sum()
    assert hits >= 16


def test_augment_batch_jits(rng):
    cfg = get_default_cfg()
    cfg.TRAIN.AUGMENTATIONS.FLIP = True
    batch = {
        "points": jnp.asarray(rng.randn(2, 128, 4).astype(np.float32) * 10),
        "gt_boxes": jnp.asarray(
            np.stack([random_boxes(rng, 6) for _ in range(2)])
        ),
        "gt_labels": jnp.asarray(np.ones((2, 6), np.int32)),
    }
    fn = jax.jit(lambda r, b: da.augment_batch(r, b, cfg.TRAIN.AUGMENTATIONS))
    out = fn(jax.random.PRNGKey(0), batch)
    assert out["points"].shape == batch["points"].shape
    assert np.isfinite(np.asarray(out["points"])).all()
    out2 = fn(jax.random.PRNGKey(1), batch)
    assert not np.allclose(np.asarray(out["points"]), np.asarray(out2["points"]))


def test_bev_rects_overlap_matches_polygon_iou(rng):
    """SAT overlap == (polygon-clip BEV IoU > 0) on random rotated boxes
    (collision tests consume only the boolean)."""
    from ssd3d.core.iou import bev_rects_overlap, boxes_iou_bev_3d

    boxes_a = random_boxes(rng, 40)
    boxes_b = random_boxes(rng, 30)
    sat = np.asarray(bev_rects_overlap(jnp.asarray(boxes_a),
                                       jnp.asarray(boxes_b)))
    iou, _ = boxes_iou_bev_3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b))
    ref = np.asarray(iou) > 1e-9
    # tolerate disagreement only within float slack of exact tangency
    disagree = sat != ref
    assert disagree.mean() < 0.01, f"{disagree.sum()} disagreements"


def test_paste_slots_unique():
    """The coprime-stride slot draw covers k*p distinct slots (n = 2^m)."""
    import jax

    n, k, p = 16384, 13, 512
    r_start, r_step = jax.random.split(jax.random.PRNGKey(7))
    start = jax.random.randint(r_start, (), 0, n)
    step = jax.random.randint(r_step, (), 0, n // 2) * 2 + 1
    slots = np.asarray((start + jnp.arange(k * p) * step) % n)
    assert len(np.unique(slots)) == k * p
