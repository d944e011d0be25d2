"""Geometry core vs independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from ssd3d.core import geometry as geo
from ssd3d.core import iou as iou_lib

from conftest import random_boxes


def np_corners(box):
    """Independent oracle: corners of one box_3d (reference layout,
    box_3d_utils.py:62)."""
    x, y, z, l, h, w, ry = box
    xs = np.array([l / 2, l / 2, -l / 2, -l / 2] * 2)
    ys = np.array([0, 0, 0, 0, -h, -h, -h, -h], dtype=np.float64)
    zs = np.array([w / 2, -w / 2, -w / 2, w / 2] * 2)
    c, s = np.cos(ry), np.sin(ry)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    pts = rot @ np.stack([xs, ys, zs])
    return (pts + np.array([[x], [y], [z]])).T


def test_corners_match_oracle(rng):
    boxes = random_boxes(rng, 32)
    got = np.asarray(geo.boxes_to_corners(jnp.asarray(boxes)))
    for i in range(32):
        np.testing.assert_allclose(got[i], np_corners(boxes[i]), atol=1e-4)


def test_points_in_boxes_axis_aligned(rng):
    # axis-aligned box at origin: trivially checkable
    box = np.array([[0.0, 1.0, 0.0, 4.0, 2.0, 2.0, 0.0]], np.float32)
    pts = np.array(
        [
            [0.0, 0.5, 0.0],  # inside
            [1.9, 0.0, 0.9],  # inside (y in [-1, 1])
            [2.1, 0.5, 0.0],  # outside x
            [0.0, 1.5, 0.0],  # outside y (below bottom face)
            [0.0, -1.5, 0.0],  # outside y (above top face)
            [0.0, 0.5, 1.5],  # outside z
        ],
        np.float32,
    )
    mask = np.asarray(geo.points_in_boxes(jnp.asarray(pts), jnp.asarray(box)))
    np.testing.assert_array_equal(mask[:, 0], [True, True, False, False, False, False])


def test_points_in_boxes_rotation_invariance(rng):
    """Membership must be invariant to rotating both points and the box."""
    boxes = random_boxes(rng, 8)
    pts = rng.uniform(-30, 30, size=(256, 3)).astype(np.float32)
    pts[:, 2] += 40
    base = np.asarray(geo.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))

    theta = 0.7
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    pts_r = pts @ rot.T
    boxes_r = boxes.copy()
    boxes_r[:, :3] = boxes[:, :3] @ rot.T
    boxes_r[:, 6] += theta
    rotated = np.asarray(
        geo.points_in_boxes(jnp.asarray(pts_r), jnp.asarray(boxes_r))
    )
    # allow tiny boundary flips
    assert (base != rotated).mean() < 0.01


def test_centerness_properties(rng):
    boxes = random_boxes(rng, 16)
    # point at the volumetric center -> centerness 1
    ctr = boxes[:, :3].copy()
    ctr[:, 1] -= boxes[:, 4] / 2
    got = np.asarray(
        geo.centerness(jnp.asarray(ctr)[None], jnp.asarray(boxes)[None])
    )[0]
    np.testing.assert_allclose(got, 1.0, atol=1e-4)
    # near a face -> small
    face = boxes[:, :3].copy()
    face[:, 1] -= 0.01  # just above bottom face
    got_face = np.asarray(
        geo.centerness(jnp.asarray(face)[None], jnp.asarray(boxes)[None])
    )[0]
    assert (got_face < 0.5).all()


def test_bev_aabb(rng):
    boxes = random_boxes(rng, 16)
    got = np.asarray(geo.boxes_to_bev_aabb(jnp.asarray(boxes)))
    for i in range(16):
        corners = np_corners(boxes[i])
        np.testing.assert_allclose(got[i, 0], corners[:, 0].min(), atol=1e-4)
        np.testing.assert_allclose(got[i, 2], corners[:, 0].max(), atol=1e-4)
        np.testing.assert_allclose(got[i, 1], corners[:, 2].min(), atol=1e-4)
        np.testing.assert_allclose(got[i, 3], corners[:, 2].max(), atol=1e-4)


def test_square_distance(rng):
    a = rng.randn(2, 16, 8).astype(np.float32)
    b = rng.randn(2, 24, 8).astype(np.float32)
    got = np.asarray(geo.square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-3)


def shoelace_iou(box_a, box_b, n_grid=400):
    """Monte-Carlo-free oracle: rasterized BEV IoU on a fine grid."""
    from conftest import random_boxes  # noqa

    all_c = np.concatenate(
        [np_corners(box_a)[:4, [0, 2]], np_corners(box_b)[:4, [0, 2]]]
    )
    lo, hi = all_c.min(0) - 0.1, all_c.max(0) + 0.1
    xs = np.linspace(lo[0], hi[0], n_grid)
    zs = np.linspace(lo[1], hi[1], n_grid)
    gx, gz = np.meshgrid(xs, zs)
    cell = (xs[1] - xs[0]) * (zs[1] - zs[0])

    def inside(box):
        x, _, z, l, _, w, ry = box
        dx, dz = gx - x, gz - z
        cx = np.cos(ry) * dx - np.sin(ry) * dz
        cz = np.sin(ry) * dx + np.cos(ry) * dz
        return (np.abs(cx) <= l / 2) & (np.abs(cz) <= w / 2)

    ia, ib = inside(box_a), inside(box_b)
    inter = (ia & ib).sum() * cell
    union = ia.sum() * cell + ib.sum() * cell - inter
    return inter / max(union, 1e-9)


def test_rotated_bev_iou_vs_raster(rng):
    boxes_a = random_boxes(rng, 6)
    boxes_b = boxes_a.copy()
    boxes_b[:, :3] += rng.uniform(-1, 1, size=(6, 3)).astype(np.float32)
    boxes_b[:, 6] += rng.uniform(-0.5, 0.5, size=6).astype(np.float32)
    iou_bev, _ = iou_lib.boxes_iou_bev_3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b))
    iou_bev = np.asarray(iou_bev)
    for i in range(6):
        for j in range(6):
            want = shoelace_iou(boxes_a[i], boxes_b[j])
            assert abs(iou_bev[i, j] - want) < 0.02, (i, j, iou_bev[i, j], want)


def test_iou_self_is_one(rng):
    boxes = random_boxes(rng, 12)
    iou_bev, iou_3d = iou_lib.boxes_iou_bev_3d(
        jnp.asarray(boxes), jnp.asarray(boxes)
    )
    np.testing.assert_allclose(np.diag(np.asarray(iou_bev)), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.diag(np.asarray(iou_3d)), 1.0, atol=1e-3)
    m_bev, m_3d = iou_lib.boxes_iou_matched(jnp.asarray(boxes), jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(m_bev), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_3d), 1.0, atol=1e-3)


def test_iou_disjoint_is_zero(rng):
    a = np.array([[0, 1, 0, 2, 2, 2, 0.3]], np.float32)
    b = np.array([[10, 1, 10, 2, 2, 2, -0.2]], np.float32)
    iou_bev, iou_3d = iou_lib.boxes_iou_bev_3d(jnp.asarray(a), jnp.asarray(b))
    assert float(iou_bev[0, 0]) == 0.0
    assert float(iou_3d[0, 0]) == 0.0
