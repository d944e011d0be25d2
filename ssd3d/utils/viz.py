"""Debug visualization: BEV and 3D renders of point clouds + boxes.

Counterpart of the reference's mayavi viewer (mayavi/viz_util.py:39
draw_lidar, :111 draw_gt_boxes3d) and 2D corner projector (demo_utils.py),
but headless: `draw_bev`/`draw_scene_3d` write PNG via matplotlib
(import-gated so the core framework stays dependency-free), and
`dump_scene_html` writes a self-contained interactive 3D viewer (inline
canvas renderer, drag to orbit — no network, no external scripts)."""

from __future__ import annotations

import json

import numpy as np

# 12 wireframe edges over the corner order of geometry.boxes_to_corners
# (bottom face 0-3, top face 4-7) — same loop structure as the reference's
# draw_gt_boxes3d (mayavi/viz_util.py:123-136)
_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
              (4, 5), (5, 6), (6, 7), (7, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def _corners_3d(boxes: np.ndarray) -> np.ndarray:
    """numpy twin of geometry.boxes_to_corners: box_3d [m,7] (bottom-center
    y, camera coords) -> [m, 8, 3]."""
    boxes = np.asarray(boxes, np.float64)
    x, y, z = boxes[:, 0], boxes[:, 1], boxes[:, 2]
    l, h, w, ry = boxes[:, 3], boxes[:, 4], boxes[:, 5], boxes[:, 6]
    hl, hw = l / 2.0, w / 2.0
    zero = np.zeros_like(l)
    xs = np.stack([hl, hl, -hl, -hl] * 2, 1)
    ys = np.stack([zero] * 4 + [-h] * 4, 1)
    zs = np.stack([hw, -hw, -hw, hw] * 2, 1)
    c, s = np.cos(ry)[:, None], np.sin(ry)[:, None]
    rx = c * xs + s * zs
    rz = -s * xs + c * zs
    return np.stack([rx + x[:, None], ys + y[:, None], rz + z[:, None]], -1)


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


def draw_scene_3d(points: np.ndarray, path: str, gt_boxes=None,
                  pred_boxes=None, pred_scores=None, max_points=30000,
                  elev=18.0, azim=-100.0, title=""):
    """Save a 3D render: lidar points (height-colored) + GT (green) and
    predicted (orange) wireframe boxes. Headless stand-in for the
    reference's mayavi draw_lidar + draw_gt_boxes3d (viz_util.py:39,111).

    points: [n, >=3] in KITTI camera coords (x right, y down, z forward);
    rendered with z forward / x right / -y up. boxes: [m, 7] box_3d.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)[:, :3]
    if len(pts) > max_points:
        pts = pts[np.random.default_rng(0).choice(
            len(pts), max_points, replace=False)]

    fig = plt.figure(figsize=(11, 7), dpi=110)
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=0.25, c=-pts[:, 1],
               cmap="viridis", linewidths=0, alpha=0.8)

    def draw(boxes, color, labels=None):
        for i, corner in enumerate(_corners_3d(boxes)):
            for a, b in _BOX_EDGES:
                ax.plot([corner[a, 0], corner[b, 0]],
                        [corner[a, 2], corner[b, 2]],
                        [-corner[a, 1], -corner[b, 1]],
                        color=color, lw=1.1)
            if labels is not None:
                top = corner[4:].mean(0)
                ax.text(top[0], top[2], -top[1], f"{labels[i]:.2f}",
                        color=color, fontsize=6)

    if gt_boxes is not None and len(gt_boxes):
        draw(gt_boxes, "#2a9d3f")
    if pred_boxes is not None and len(pred_boxes):
        draw(pred_boxes, "#e76f2a", pred_scores)

    # near-equal aspect: matplotlib 3d has no set_aspect('equal') that
    # respects data ranges, so set the box aspect from the spans
    spans = np.array([np.ptp(pts[:, 0]), np.ptp(pts[:, 2]),
                      max(np.ptp(pts[:, 1]), 1.0)])
    ax.set_box_aspect(spans / spans.max())
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_zlabel("up (m)")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path


_HTML_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>ssd3d scene</title>
<style>body{margin:0;background:#111;color:#ccc;font:12px monospace}
canvas{display:block}#hud{position:fixed;top:8px;left:8px}</style></head>
<body><div id="hud">drag: orbit &middot; wheel: zoom &middot; %(n_pts)d pts
&middot; <span style="color:#2a9d3f">gt</span>
<span style="color:#e76f2a">pred</span></div>
<canvas id="c"></canvas><script>
const PTS=%(pts)s, GT=%(gt)s, PRED=%(pred)s, EDGES=%(edges)s;
const cv=document.getElementById('c'),ctx=cv.getContext('2d');
let yaw=-1.9,pitch=0.35,dist=65,cx=0,cz=25;
function resize(){cv.width=innerWidth;cv.height=innerHeight;draw()}
function proj(p){ // camera coords: x right, y down, z fwd -> orbit cam
  const X=p[0]-cx,Y=-p[1],Z=p[2]-cz;
  const cy_=Math.cos(yaw),sy=Math.sin(yaw),cp=Math.cos(pitch),
        sp=Math.sin(pitch);
  const x1=cy_*X+sy*Z, z1=-sy*X+cy_*Z;
  const y2=cp*Y-sp*z1, z2=sp*Y+cp*z1+dist;
  if(z2<0.5)return null;
  const f=0.9*Math.min(cv.width,cv.height);
  return [cv.width/2+f*x1/z2, cv.height/2-f*y2/z2, z2];}
function draw(){ctx.fillStyle='#111';ctx.fillRect(0,0,cv.width,cv.height);
  for(const p of PTS){const s=proj(p);if(!s)continue;
    const t=Math.max(0,Math.min(1,(-p[1]+2)/4));
    ctx.fillStyle=`rgb(${40+160*t},${80+120*t},${255-130*t})`;
    ctx.fillRect(s[0],s[1],1.4,1.4);}
  function box(corners,color){ctx.strokeStyle=color;ctx.beginPath();
    for(const e of EDGES){const a=proj(corners[e[0]]),b=proj(corners[e[1]]);
      if(!a||!b)continue;ctx.moveTo(a[0],a[1]);ctx.lineTo(b[0],b[1]);}
    ctx.stroke();}
  for(const c of GT)box(c,'#2a9d3f');
  for(const c of PRED)box(c,'#e76f2a');}
let dragging=false,lx=0,ly=0;
cv.onmousedown=e=>{dragging=true;lx=e.clientX;ly=e.clientY};
onmouseup=()=>dragging=false;
onmousemove=e=>{if(!dragging)return;yaw+=(e.clientX-lx)*0.005;
  pitch=Math.max(-1.4,Math.min(1.4,pitch+(e.clientY-ly)*0.005));
  lx=e.clientX;ly=e.clientY;draw()};
cv.onwheel=e=>{dist=Math.max(5,dist*(e.deltaY>0?1.1:0.9));draw();
  e.preventDefault()};
onresize=resize;resize();
</script></body></html>
"""


def dump_scene_html(points: np.ndarray, path: str, gt_boxes=None,
                    pred_boxes=None, max_points=20000):
    """Write a self-contained interactive 3D scene viewer (single HTML
    file, inline canvas renderer, no external resources). The 3D analog of
    the reference's mayavi interactive window for headless environments."""
    pts = np.asarray(points)[:, :3]
    if len(pts) > max_points:
        pts = pts[np.random.default_rng(0).choice(
            len(pts), max_points, replace=False)]

    def corners_list(boxes):
        if boxes is None or len(boxes) == 0:
            return []
        return np.round(_corners_3d(boxes), 3).tolist()

    html = _HTML_TEMPLATE % {
        "n_pts": len(pts),
        "pts": json.dumps(np.round(pts, 3).tolist()),
        "gt": json.dumps(corners_list(gt_boxes)),
        "pred": json.dumps(corners_list(pred_boxes)),
        "edges": json.dumps(_BOX_EDGES),
    }
    with open(path, "w") as f:
        f.write(html)
    return path
