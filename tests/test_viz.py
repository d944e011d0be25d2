"""Headless visualization: BEV PNG, 3D PNG, interactive HTML scene dump
(the 3D pair is the stand-in for the reference's mayavi viewer,
mayavi/viz_util.py:39 draw_lidar / :111 draw_gt_boxes3d)."""

import numpy as np

from ssd3d.utils.viz import (_corners_3d, draw_bev, draw_scene_3d,
                             dump_scene_html)


def _scene():
    rng = np.random.default_rng(0)
    pts = rng.uniform([-20, -1, 0], [20, 2, 50], (4000, 3)).astype(np.float32)
    gt = np.array([[2.0, 1.6, 20.0, 3.9, 1.5, 1.6, 0.3],
                   [-5.0, 1.6, 30.0, 3.9, 1.5, 1.6, -1.2]], np.float32)
    pred = np.array([[2.1, 1.6, 20.2, 3.8, 1.5, 1.6, 0.25]], np.float32)
    return pts, gt, pred


def test_corners_3d_matches_geometry():
    import jax.numpy as jnp

    from ssd3d.core.geometry import boxes_to_corners

    _, gt, _ = _scene()
    ours = _corners_3d(gt)
    ref = np.asarray(boxes_to_corners(jnp.asarray(gt)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_draw_bev_and_scene_3d(tmp_path):
    pts, gt, pred = _scene()
    p1 = draw_bev(pts, str(tmp_path / "bev.png"), gt_boxes=gt,
                  pred_boxes=pred, pred_scores=np.array([0.9]))
    p2 = draw_scene_3d(pts, str(tmp_path / "s3d.png"), gt_boxes=gt,
                       pred_boxes=pred, pred_scores=np.array([0.9]))
    for p in (p1, p2):
        data = open(p, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 1000


def test_draw_scene_3d_no_boxes(tmp_path):
    pts, _, _ = _scene()
    draw_scene_3d(pts, str(tmp_path / "bare.png"))


def test_dump_scene_html(tmp_path):
    pts, gt, pred = _scene()
    path = dump_scene_html(pts, str(tmp_path / "scene.html"),
                           gt_boxes=gt, pred_boxes=pred, max_points=1000)
    html = open(path).read()
    assert html.startswith("<!doctype html>")
    assert "const PTS=" in html and "drag: orbit" in html
    # self-contained: no external fetches
    assert "http" not in html and "src=" not in html
    # point budget respected
    assert html.count("[") < 1200 + 3 * 8 * 2 + 50


def test_dump_scene_html_empty_boxes(tmp_path):
    pts, _, _ = _scene()
    path = dump_scene_html(pts, str(tmp_path / "e.html"), max_points=200)
    assert "GT=[]" in open(path).read()
