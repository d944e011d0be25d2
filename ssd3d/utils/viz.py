"""Debug visualization: BEV renders of point clouds + boxes.

Counterpart of the reference's mayavi viewer (mayavi/viz_util.py) and 2D
corner projector (demo_utils.py), but headless: writes PNG via matplotlib
(import-gated so the core framework stays dependency-free)."""

from __future__ import annotations

import numpy as np


def _bev_corners(boxes: np.ndarray) -> np.ndarray:
    x, z = boxes[:, 0], boxes[:, 2]
    half_l, half_w = boxes[:, 3] / 2.0, boxes[:, 5] / 2.0
    ry = boxes[:, 6]
    lx = np.stack([half_l, -half_l, -half_l, half_l], 1)
    lz = np.stack([half_w, half_w, -half_w, -half_w], 1)
    c, s = np.cos(ry)[:, None], np.sin(ry)[:, None]
    return np.stack(
        [c * lx + s * lz + x[:, None], -s * lx + c * lz + z[:, None]], -1
    )


def draw_bev(points: np.ndarray, path: str, gt_boxes=None, pred_boxes=None,
             pred_scores=None, extent=((-40, 40), (0, 70)), title=""):
    """Save a BEV (x-z) scatter with optional GT (green) and predicted
    (orange) boxes. points: [n, >=3]; boxes: [m, 7] box_3d."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 7), dpi=110)
    ax.scatter(points[:, 0], points[:, 2], s=0.3, c="#555", linewidths=0)

    def draw(boxes, color, labels=None):
        corners = _bev_corners(np.asarray(boxes))
        for i, quad in enumerate(corners):
            loop = np.vstack([quad, quad[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color=color, lw=1.2)
            if labels is not None:
                ax.text(quad[0, 0], quad[0, 1], f"{labels[i]:.2f}",
                        color=color, fontsize=6)

    if gt_boxes is not None and len(gt_boxes):
        draw(gt_boxes, "#2a9d3f")
    if pred_boxes is not None and len(pred_boxes):
        draw(pred_boxes, "#e76f2a", pred_scores)
    ax.set_xlim(*extent[0])
    ax.set_ylim(*extent[1])
    ax.set_aspect("equal")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
