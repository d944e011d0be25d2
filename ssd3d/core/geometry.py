"""Pure-JAX 3D box geometry for camera-frame (KITTI rect) point clouds.

Box convention (identical to the reference framework so labels/configs port):
    box_3d = [x, y, z, l, h, w, ry]
where (x, y, z) is the BOTTOM-face center in camera coordinates (y points
down), `l` extends along the box x-axis, `w` along the box z-axis, `h`
upward (-y), and `ry` is the rotation about the y axis.

Behavior parity sources (studied, not copied):
- corners layout: reference lib/utils/box_3d_utils.py:62-115
- y-rotation: reference lib/utils/rotation_util.py:4-31
- point-in-box: reference lib/utils/voxelnet_aug.py:318-343 (check_inside_points)
- BEV projection: reference lib/utils/anchors_util.py:11-49 (axis-aligned)

Everything here is shape-polymorphic over leading batch dims, jit-safe, and
differentiable where it makes sense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rotation_y(ry: Array) -> Array:
    """Rotation matrices about the camera y axis. ry: [...]; returns [..., 3, 3]."""
    c, s = jnp.cos(ry), jnp.sin(ry)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    row0 = jnp.stack([c, zero, s], axis=-1)
    row1 = jnp.stack([zero, one, zero], axis=-1)
    row2 = jnp.stack([-s, zero, c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotate_points_y(points: Array, ry: Array) -> Array:
    """Rotate point sets about y. points: [..., n, 3], ry: [...] -> [..., n, 3]."""
    rot = rotation_y(ry)
    # HIGHEST: the default bf16 matmul pass truncates coordinates to ~3
    # significant digits (≈0.1 m at 30 m range), shifting box corners and
    # flipping membership tests near box faces.
    return jnp.einsum(
        "...ij,...nj->...ni", rot, points,
        precision=jax.lax.Precision.HIGHEST,
    )


def boxes_to_corners(boxes: Array) -> Array:
    """box_3d [..., 7] -> 8 corners [..., 8, 3].

    Corner order matches the reference helper (box_3d_utils.py:62):
    bottom face first (y=0 locally), then top face (y=-h); x alternates
    +l/2,+l/2,-l/2,-l/2 and z +w/2,-w/2,-w/2,+w/2.
    """
    ctr, l, h, w, ry = (
        boxes[..., 0:3],
        boxes[..., 3],
        boxes[..., 4],
        boxes[..., 5],
        boxes[..., 6],
    )
    half_l, half_w = l / 2.0, w / 2.0
    zero = jnp.zeros_like(l)
    xs = jnp.stack([half_l, half_l, -half_l, -half_l] * 2, axis=-1)
    ys = jnp.stack([zero, zero, zero, zero, -h, -h, -h, -h], axis=-1)
    zs = jnp.stack([half_w, -half_w, -half_w, half_w] * 2, axis=-1)
    local = jnp.stack([xs, ys, zs], axis=-1)  # [..., 8, 3]
    return rotate_points_y(local, ry) + ctr[..., None, :]


def canonicalize_points(points: Array, boxes: Array) -> Array:
    """Express points in each box's local frame.

    points: [..., n, 3]; boxes: [..., 7] -> canonical points [..., n, 3]
    (translated by bottom-center and rotated by -ry).
    """
    shifted = points - boxes[..., None, 0:3]
    return rotate_points_y(shifted, -boxes[..., 6])


def points_in_boxes(points: Array, boxes: Array, expand: float = 0.0) -> Array:
    """Membership mask of points inside rotated 3D boxes.

    points: [n, 3] (or [..., n, 3]); boxes: [m, 7] (or [..., m, 7])
    returns bool [..., n, m]. `expand` enlarges l/h/w symmetrically
    (the reference enlarges GT boxes by EXPAND_DIMS_LENGTH for vote targets).
    """
    # canonical coords of every point w.r.t. every box: [..., m, n, 3]
    pts = points[..., None, :, :] - boxes[..., :, None, 0:3]
    canon = rotate_points_y(pts, -boxes[..., 6])
    l = boxes[..., 3] + expand
    h = boxes[..., 4] + expand
    w = boxes[..., 5] + expand
    inside_x = jnp.abs(canon[..., 0]) <= (l[..., None] / 2.0)
    # y local spans [0, -h] for a point at the bottom face; expand splits evenly
    inside_y = (canon[..., 1] <= expand / 2.0) & (canon[..., 1] >= -(h[..., None]))
    inside_z = jnp.abs(canon[..., 2]) <= (w[..., None] / 2.0)
    mask = inside_x & inside_y & inside_z  # [..., m, n]
    return jnp.swapaxes(mask, -1, -2)  # [..., n, m]


def boxes_to_bev_aabb(boxes: Array) -> Array:
    """Axis-aligned BEV rectangle of a box_3d, reference-NMS style.

    The reference projects via box_3d_to_anchor (dims inflated by |cos|,|sin|
    of ry — anchors_util.py:11 + box_3d_utils.py:25), i.e. the axis-aligned
    bounding rect of the rotated footprint. Returns [..., 4] = x1, z1, x2, z2.
    """
    x, z = boxes[..., 0], boxes[..., 2]
    l, w, ry = boxes[..., 3], boxes[..., 5], boxes[..., 6]
    cos_r, sin_r = jnp.abs(jnp.cos(ry)), jnp.abs(jnp.sin(ry))
    half_dx = (l * cos_r + w * sin_r) / 2.0
    half_dz = (w * cos_r + l * sin_r) / 2.0
    return jnp.stack([x - half_dx, z - half_dz, x + half_dx, z + half_dz], axis=-1)


def boxes_bottom_to_center(boxes: Array) -> Array:
    """Shift box_3d xyz from bottom-face center to volumetric center
    (reference model_util.py:243 cast_bottom_to_center; camera y points down
    so the center is at y - h/2)."""
    ctr_y = boxes[..., 1] - boxes[..., 4] / 2.0
    return jnp.concatenate(
        [boxes[..., 0:1], ctr_y[..., None], boxes[..., 2:]], axis=-1
    )


def centerness(base_xyz: Array, boxes: Array, eps: float = 1e-6) -> Array:
    """FCOS-style 3D center-ness of points w.r.t. their assigned boxes.

    base_xyz: [..., n, 3]; boxes: [..., n, 7] (one assigned box per point)
    returns [..., n] in (0, 1]. Matches reference loss_builder.py:99-137:
    canonical-rotate the point into the box, take per-axis min/max face
    distance ratios, geometric-mean over l/h/w.
    """
    canon = rotate_points_y(
        (base_xyz - boxes[..., 0:3])[..., None, :], -boxes[..., 6]
    )[..., 0, :]
    l, h, w = boxes[..., 3], boxes[..., 4], boxes[..., 5]
    d_front = l / 2.0 - canon[..., 0]
    d_back = canon[..., 0] + l / 2.0
    d_bottom = -canon[..., 1]
    d_top = canon[..., 1] + h
    d_left = w / 2.0 - canon[..., 2]
    d_right = canon[..., 2] + w / 2.0

    def _ratio(a, b):
        return jnp.minimum(a, b) / jnp.maximum(a, b)

    ctr = _ratio(d_front, d_back) * _ratio(d_bottom, d_top) * _ratio(d_left, d_right)
    return jnp.power(jnp.maximum(ctr, eps), 1.0 / 3.0)


def flip_boxes_x(boxes: Array) -> Array:
    """Mirror boxes across the x=0 plane (KITTI flip augmentation):
    x -> -x, ry -> pi - ry (reference lib/utils/kitti_aug.py:48)."""
    x = -boxes[..., 0]
    ry = jnp.pi - boxes[..., 6]
    out = boxes.at[..., 0].set(x)
    return out.at[..., 6].set(ry)


def square_distance(a: Array, b: Array, normalize: bool = False) -> Array:
    """Pairwise squared distance matrix via one matmul (MXU-friendly).

    a: [..., n, c]; b: [..., m, c] -> [..., n, m]. With normalize=True returns
    sqrt(d)/c (the reference's normalized variant, model_util.py:144)."""
    a_sq = jnp.sum(a * a, axis=-1, keepdims=True)  # [..., n, 1]
    b_sq = jnp.sum(b * b, axis=-1)[..., None, :]  # [..., 1, m]
    # HIGHEST precision is required: the a²+b²−2ab form cancels catastrophically
    # and the TPU MXU's default bf16 passes collapse nearby distances into ties
    # (observed: F-FPS degenerates to duplicate picks without this).
    cross = jnp.einsum(
        "...nc,...mc->...nm",
        a,
        b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = a_sq + b_sq - 2.0 * cross
    if normalize:
        return jnp.sqrt(jnp.maximum(d, 0.0)) / a.shape[-1]
    return d
