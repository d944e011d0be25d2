"""On-device (jit) training augmentation.

The reference runs its whole augmentation chain in numpy worker processes
(builder/data_augmentor.py); here the same chain runs INSIDE the compiled
train step on fixed shapes, so the host only loads raw scans and GT-crop
candidates. This is the "on-device GT-sampling augmentation" configuration
from the project baseline (training config #5).

Stages (order matches data_augmentor.kitti_forward):
1. GT-sample paste: candidate crops are accepted greedily when their
   (enlarged) rotated BEV footprint overlaps no current box, snapped onto the
   road plane; their points overwrite reserved point slots.
2. random x-flip (whole scene)
3. per-object noise: per-GT rotation/translation candidates with collision
   rejection (tries evaluated in parallel, boxes processed sequentially via
   scan like the reference loop)
4. global rotation, 5. global scale.

Deviations from the host reference (documented):
- candidate points for the paste come pre-cropped from the host at a fixed
  per-crop cap with validity masks (the database IO stays on host);
  accepted crops overwrite random existing point slots instead of
  re-sampling the concatenated cloud (fixed shapes; the overwritten slots
  are a uniform subsample, matching the reference's random point budget in
  distribution).
- per-object noise tests candidate placements against the other boxes'
  ORIGINAL footprints (the reference tests against footprints updated in
  sequence); collisions this misses are rare second-order overlaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssd3d.core.geometry import points_in_boxes
from ssd3d.core.iou import bev_rects_overlap

Array = jax.Array


def _bev_overlaps(boxes_a: Array, boxes_b: Array) -> Array:
    """bool [a, b]: rotated BEV footprints overlap (area > 0).

    Separating-axis test (core/iou.bev_rects_overlap) — collision checks
    only consume the boolean, so the polygon-clip IoU would be wasted
    work (it was the dominant cost of the on-device noise stage)."""
    return bev_rects_overlap(boxes_a, boxes_b)


def paste_gt_samples(rng, points, gt_boxes, gt_labels, cand_points,
                     cand_boxes, cand_labels, cand_valid, plane,
                     enlarge=(0.5, 2.0, 0.5)):
    """Greedy non-colliding paste with plane snapping, one scene.

    points [n, 4]; gt_boxes [g, 7] zero-padded; cand_points [k, p, 4] with
    NaN-padded invalid rows? No — cand_valid [k] marks usable crops and the
    per-crop point count is carried in cand_points[..., 3] sign? Keep it
    simple: cand_points rows beyond the crop's true size repeat its first
    point (same contract as the ball-query pad)."""
    g = gt_boxes.shape[0]
    k = cand_boxes.shape[0]
    p = cand_points.shape[1]
    n = points.shape[0]
    a, b, c, d = plane[0], plane[1], plane[2], plane[3]

    enlarged_cand = jnp.concatenate(
        [cand_boxes[:, 0:3], cand_boxes[:, 3:6] + jnp.asarray(enlarge),
         cand_boxes[:, 6:7]], axis=-1,
    )
    gt_valid = jnp.any(gt_boxes != 0, axis=-1)

    # snap candidates onto the plane
    plane_y = (-d - a * cand_boxes[:, 0] - c * cand_boxes[:, 2]) / b
    dy = cand_boxes[:, 1] - plane_y
    cand_boxes = cand_boxes.at[:, 1].add(-dy)
    enlarged_cand = enlarged_cand.at[:, 1].add(-dy)
    cand_points = cand_points.at[:, :, 1].add(-dy[:, None])

    # sequential accept loop (collisions against already-accepted crops too)
    def body(carry, i):
        boxes, labels, accept = carry
        cand = enlarged_cand[i]
        coll = _bev_overlaps(cand[None], boxes)[0]
        live = jnp.any(gt_boxes != 0, axis=-1) | (labels > 0)
        ok = cand_valid[i] & ~jnp.any(coll & live)
        slot = jnp.argmin(live)  # first free GT slot
        can_place = ok & ~live[slot]
        boxes = jnp.where(
            can_place,
            boxes.at[slot].set(cand_boxes[i]),
            boxes,
        )
        labels = jnp.where(
            can_place, labels.at[slot].set(cand_labels[i]), labels
        )
        return (boxes, labels, accept.at[i].set(can_place)), None

    (new_boxes, new_labels, accepted), _ = jax.lax.scan(
        body, (gt_boxes, gt_labels, jnp.zeros((k,), bool)), jnp.arange(k)
    )

    # overwrite random point slots with accepted crops' points.
    # Unique slots via a random coprime stride instead of
    # random.choice(replace=False): choice lowers to a full 16k-key sort
    # (~100 ms/scene on TPU); slot_i = (start + i*odd_step) mod n visits
    # k*p distinct slots in O(1) work for the power-of-two n used here
    # (documented deviation: a random lattice rather than an iid
    # without-replacement draw — both are uniform over slots marginally).
    r_start, r_step = jax.random.split(rng)
    start = jax.random.randint(r_start, (), 0, n)
    step = jax.random.randint(r_step, (), 0, n // 2) * 2 + 1  # odd
    slots = (start + jnp.arange(k * p) * step) % n
    slots = slots.reshape(k, p)
    flat_slots = slots.reshape(-1)
    flat_pts = cand_points.reshape(k * p, -1)
    write = jnp.repeat(accepted, p)
    cur = points[flat_slots]
    merged = jnp.where(write[:, None], flat_pts, cur)
    points = points.at[flat_slots].set(merged)
    return points, new_boxes, new_labels


def flip_x(rng, points, boxes):
    do = jax.random.uniform(rng) >= 0.5
    fpts = points.at[:, 0].multiply(-1.0)
    fry = jnp.where(boxes[:, 6] >= 0, jnp.pi - boxes[:, 6],
                    -jnp.pi - boxes[:, 6])
    fbox = boxes.at[:, 0].multiply(-1.0).at[:, 6].set(fry)
    return (jnp.where(do, fpts, points), jnp.where(do, fbox, boxes))


def per_object_noise(rng, points, boxes, num_try=16,
                     rotation_perturb=(-jnp.pi / 3, jnp.pi / 3),
                     center_noise_std=(1.0, 1.0, 0.0)):
    """Per-GT jitter with parallel-try collision rejection.

    Tries are scored: the first try whose jittered footprint hits no OTHER
    original footprint wins; boxes with no valid try stay put."""
    g = boxes.shape[0]
    rng_loc, rng_rot, rng_apply = jax.random.split(rng, 3)
    std = jnp.asarray([center_noise_std[0], center_noise_std[2],
                       center_noise_std[1]])  # (x, y, z) from reference (x,z,y)
    loc = jax.random.normal(rng_loc, (g, num_try, 3)) * std
    rot = jax.random.uniform(
        rng_rot, (g, num_try), minval=rotation_perturb[0],
        maxval=rotation_perturb[1],
    )
    valid_gt = jnp.any(boxes != 0, axis=-1)

    # candidate boxes [g, t, 7]
    cand = jnp.repeat(boxes[:, None, :], num_try, axis=1)
    cand = cand.at[..., 0:3].add(loc)
    cand = cand.at[..., 6].add(rot)

    coll = bev_rects_overlap(
        cand.reshape(g * num_try, 7), boxes
    ).reshape(g, num_try, g)
    not_self = ~jnp.eye(g, dtype=bool)[:, None, :]
    coll = jnp.any(coll & not_self & valid_gt[None, None, :], axis=-1)
    ok = ~coll  # [g, t]
    first_ok = jnp.argmax(ok, axis=1)
    has_ok = jnp.any(ok, axis=1) & valid_gt

    sel_loc = jnp.take_along_axis(loc, first_ok[:, None, None], 1)[:, 0]
    sel_rot = jnp.take_along_axis(rot, first_ok[:, None], 1)[:, 0]
    sel_loc = jnp.where(has_ok[:, None], sel_loc, 0.0)
    sel_rot = jnp.where(has_ok, sel_rot, 0.0)

    # move interior points with their first containing box
    inside = points_in_boxes(points[:, 0:3], boxes, expand=0.1)  # [n, g]
    inside = inside & valid_gt[None, :]
    box_of = jnp.argmax(inside, axis=-1)
    any_in = jnp.any(inside, axis=-1)
    ctr = boxes[box_of, 0:3]
    ang = sel_rot[box_of]
    off = sel_loc[box_of]
    rel = points[:, 0:3] - ctr
    cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
    rx = rel[:, 0] * cos_a + rel[:, 2] * sin_a
    rz = -rel[:, 0] * sin_a + rel[:, 2] * cos_a
    moved = jnp.stack([rx, rel[:, 1], rz], 1) + ctr + off
    new_xyz = jnp.where(any_in[:, None], moved, points[:, 0:3])
    points = points.at[:, 0:3].set(new_xyz)

    boxes = boxes.at[:, 0:3].add(sel_loc).at[:, 6].add(sel_rot)
    return points, boxes


def global_rotation(rng, points, boxes, rotation_range):
    ang = (jax.random.uniform(rng) * 2 - 1) * rotation_range
    c, s = jnp.cos(ang), jnp.sin(ang)
    rot = jnp.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    points = points.at[:, 0:3].set(points[:, 0:3] @ rot.T)
    boxes = boxes.at[:, 0:3].set(boxes[:, 0:3] @ rot.T).at[:, 6].add(ang)
    return points, boxes


def global_scale(rng, points, boxes, scale_range):
    s = (jax.random.uniform(rng) * 2 - 1) * scale_range + 1.0
    points = points.at[:, 0:3].multiply(s)
    boxes = boxes.at[:, 0:6].multiply(s)
    return points, boxes


def augment_batch(rng: Array, batch: dict, cfg_aug) -> dict:
    """Full on-device augmentation of a batch. Mixup candidates, when
    present, come as batch['cand_points'/'cand_boxes'/'cand_labels'/
    'cand_valid'] + batch['plane'] (host-loaded, fixed shapes)."""

    def one(rng, points, boxes, labels, cands):
        r = jax.random.split(rng, 6)
        if cands is not None:
            points, boxes, labels = paste_gt_samples(
                r[0], points, boxes, labels, *cands
            )
        if cfg_aug.FLIP:
            points, boxes = flip_x(r[1], points, boxes)
        choice = jax.random.uniform(r[2], (3,))
        pts_n, box_n = per_object_noise(
            r[3], points, boxes,
            rotation_perturb=tuple(cfg_aug.SINGLE_AUG.ROTATION_PERTURB),
            center_noise_std=tuple(cfg_aug.SINGLE_AUG.CENTER_NOISE_STD),
        )
        do = choice[0] <= cfg_aug.PROB[0]
        points = jnp.where(do, pts_n, points)
        boxes = jnp.where(do, box_n, boxes)
        pts_r, box_r = global_rotation(
            r[4], points, boxes, cfg_aug.RANDOM_ROTATION_RANGE
        )
        do = choice[1] <= cfg_aug.PROB[1]
        points = jnp.where(do, pts_r, points)
        boxes = jnp.where(do, box_r, boxes)
        pts_s, box_s = global_scale(
            r[5], points, boxes, cfg_aug.RANDOM_SCALE_RANGE
        )
        do = choice[2] <= cfg_aug.PROB[2]
        points = jnp.where(do, pts_s, points)
        boxes = jnp.where(do, box_s, boxes)
        return points, boxes, labels

    bs = batch["points"].shape[0]
    rngs = jax.random.split(rng, bs)
    has_cands = "cand_boxes" in batch
    if has_cands:
        cands = (batch["cand_points"], batch["cand_boxes"],
                 batch["cand_labels"], batch["cand_valid"], batch["plane"])
        points, boxes, labels = jax.vmap(
            lambda r, p, b, l, *cs: one(r, p, b, l, cs)
        )(rngs, batch["points"], batch["gt_boxes"], batch["gt_labels"], *cands)
    else:
        points, boxes, labels = jax.vmap(
            lambda r, p, b, l: one(r, p, b, l, None)
        )(rngs, batch["points"], batch["gt_boxes"], batch["gt_labels"])
    out = dict(batch)
    out.update(points=points, gt_boxes=boxes, gt_labels=labels)
    return out
