"""Box encode/decode codecs for all four regression methods.

Parity targets (behavior, not code): reference lib/utils/anchor_encoder.py and
lib/utils/anchor_decoder.py, dispatched by lib/builder/encoder_builder.py.

Methods:
- 'Dist-Anchor-free' (3DSSD): regress offset from the sampled point to the
  object VOLUMETRIC center plus half-sizes (anchor_encoder.py:151,
  anchor_decoder.py:86).
- 'Dist-Anchor': residual from per-class mean-size anchors.
- 'Log-Anchor': SECOND-style log-size residuals.
- 'Bin-Anchor' (PointRCNN): x/z binned classification + residual.

Angle is always bin(num_angle_cls) + normalized residual.

All functions operate on merged [bs, n, ...] tensors where n = points*cls; the
callers reshape (encoder_builder.py:44-94 semantics).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# angle <-> (bin class, normalized residual)
# ---------------------------------------------------------------------------

def encode_angle_to_class(angle: Array, num_class: int) -> tuple[Array, Array]:
    """angle [..., ] -> (class int32 [...], residual in [-0.5, 0.5] [...]).

    Matches anchor_encoder.py:22 encode_angle2class_tf: shift by half a bin,
    floor-divide, normalize residual by the bin width."""
    angle = jnp.mod(angle, TWO_PI)
    per_class = TWO_PI / num_class
    shifted = jnp.mod(angle + per_class / 2.0, TWO_PI)
    cls_f = jnp.floor(shifted / per_class)
    residual = (shifted - (cls_f * per_class + per_class / 2.0)) / per_class
    return cls_f.astype(jnp.int32), residual


def decode_class_to_angle(
    pred_cls: Array,
    pred_res_norm: Array,
    bin_size: int,
    bin_interval: float,
    bin_offset: float = 0.0,
) -> Array:
    """Inverse of the bin encoding (anchor_decoder.py:6 decode_class2angle).

    pred_cls: int [...]; pred_res_norm: [..., bin_size] (per-bin residuals,
    the one matching pred_cls is selected)."""
    onehot = jax.nn.one_hot(pred_cls, bin_size, dtype=pred_res_norm.dtype)
    res = jnp.sum(onehot * pred_res_norm, axis=-1)
    return (pred_cls.astype(pred_res_norm.dtype) + res + bin_offset) * bin_interval


def _encode_bin_residual(res: Array, half_range: float, num_bins: int):
    """Scalar residual -> (bin class f32, normalized in-bin residual)."""
    interval = half_range * 2.0 / num_bins
    bin_cls = jnp.floor((res + half_range) / interval)
    bin_cls = jnp.clip(bin_cls, 0.0, float(num_bins - 1))
    bin_res = (res + half_range - (bin_cls * interval + interval / 2.0)) / interval
    return bin_cls, bin_res


# ---------------------------------------------------------------------------
# codecs — encode(gt_ctr, gt_size, anchor_ctr, anchor_size) -> (ctr6a, size6b)
# ---------------------------------------------------------------------------

def encode_dist_anchor_free(gt_ctr, gt_size, anchor_ctr, anchor_size=None):
    """3DSSD: target = (object volumetric center − point), half sizes."""
    half = gt_size / 2.0
    pad = jnp.stack(
        [jnp.zeros_like(half[..., 1]), half[..., 1], jnp.zeros_like(half[..., 1])],
        axis=-1,
    )
    # gt y is the bottom face; volumetric center sits at y − h/2 (camera y down)
    enc_ctr = (gt_ctr - pad) - anchor_ctr
    return enc_ctr, half


def decode_dist_anchor_free(center_xyz, det_offset, det_angle_cls, det_angle_res,
                            num_angle_cls: int):
    """det_offset: [bs, n, 6] = (3 translate, 3 half-size)."""
    angle_bin = jnp.argmax(det_angle_cls, axis=-1)
    pred_angle = decode_class_to_angle(
        angle_bin, det_angle_res, num_angle_cls, TWO_PI / num_angle_cls
    )
    translate = det_offset[..., 0:3]
    half = det_offset[..., 3:6]
    ctr = center_xyz + translate
    pad = jnp.stack(
        [jnp.zeros_like(half[..., 1]), half[..., 1], jnp.zeros_like(half[..., 1])],
        axis=-1,
    )
    ctr = ctr + pad  # volumetric center -> bottom face
    lhw = jnp.maximum(half * 2.0, 0.1)
    return jnp.concatenate([ctr, lhw, pred_angle[..., None]], axis=-1)


def encode_dist_anchor(gt_ctr, gt_size, anchor_ctr, anchor_size):
    return gt_ctr - anchor_ctr, (gt_size - anchor_size) / anchor_size


def decode_dist_anchor(det_offset, det_angle_cls, det_angle_res, anchors,
                       num_angle_cls: int):
    ctr = anchors[..., 0:3] + det_offset[..., 0:3]
    size = jnp.maximum(
        anchors[..., 3:6] + det_offset[..., 3:6] * anchors[..., 3:6], 0.1
    )
    angle_bin = jnp.argmax(det_angle_cls, axis=-1)
    pred_angle = anchors[..., 6] + decode_class_to_angle(
        angle_bin, det_angle_res, num_angle_cls, TWO_PI / num_angle_cls
    )
    return jnp.concatenate([ctr, size, pred_angle[..., None]], axis=-1)


def encode_log_anchor(gt_ctr, gt_size, anchor_ctr, anchor_size):
    a_l, a_h, a_w = anchor_size[..., 0], anchor_size[..., 1], anchor_size[..., 2]
    a_d = jnp.sqrt(a_l * a_l + a_w * a_w)
    enc_ctr = jnp.stack(
        [
            (gt_ctr[..., 0] - anchor_ctr[..., 0]) / a_d,
            (gt_ctr[..., 1] - anchor_ctr[..., 1]) / a_h,
            (gt_ctr[..., 2] - anchor_ctr[..., 2]) / a_d,
        ],
        axis=-1,
    )
    enc_size = jnp.log(gt_size / anchor_size)
    return enc_ctr, enc_size


def decode_log_anchor(det_offset, det_angle_cls, det_angle_res, anchors,
                      num_angle_cls: int):
    a_l, a_h, a_w = anchors[..., 3], anchors[..., 4], anchors[..., 5]
    a_d = jnp.sqrt(a_l * a_l + a_w * a_w)
    ctr = jnp.stack(
        [
            det_offset[..., 0] * a_d + anchors[..., 0],
            det_offset[..., 1] * a_h + anchors[..., 1],
            det_offset[..., 2] * a_d + anchors[..., 2],
        ],
        axis=-1,
    )
    size = jnp.maximum(
        jnp.exp(det_offset[..., 3:6]) * anchors[..., 3:6], 0.1
    )
    angle_bin = jnp.argmax(det_angle_cls, axis=-1)
    pred_angle = anchors[..., 6] + decode_class_to_angle(
        angle_bin, det_angle_res, num_angle_cls, TWO_PI / num_angle_cls
    )
    return jnp.concatenate([ctr, size, pred_angle[..., None]], axis=-1)


def encode_bin_anchor(gt_ctr, gt_size, anchor_ctr, anchor_size,
                      half_range: float, num_bins: int):
    """PointRCNN: x/z binned, y + size residual.

    Returns (ctr4 = [xbin, xres, zbin, zres], offset4 = [yres, dl, dh, dw])."""
    x_bin, x_res = _encode_bin_residual(
        gt_ctr[..., 0] - anchor_ctr[..., 0], half_range, num_bins
    )
    z_bin, z_res = _encode_bin_residual(
        gt_ctr[..., 2] - anchor_ctr[..., 2], half_range, num_bins
    )
    y_res = (gt_ctr[..., 1] - anchor_ctr[..., 1])[..., None]
    size_res = gt_size - anchor_size
    ctr = jnp.stack([x_bin, x_res, z_bin, z_res], axis=-1)
    return ctr, jnp.concatenate([y_res, size_res], axis=-1)


def decode_bin_anchor(det_offset, det_angle_cls, det_angle_res, anchors,
                      num_angle_cls: int, half_range: float, num_bins: int):
    """det_offset: [bs, n, 4*num_bins + 4] = xbin|xres|zbin|zres logits/res
    then [yres, dl, dh, dw]."""
    nb = num_bins
    x_bin_logit = det_offset[..., 0 * nb:1 * nb]
    x_res = det_offset[..., 1 * nb:2 * nb]
    z_bin_logit = det_offset[..., 2 * nb:3 * nb]
    z_res = det_offset[..., 3 * nb:4 * nb]
    rest = det_offset[..., 4 * nb:]

    interval = half_range * 2.0 / nb
    x_bin = jnp.argmax(x_bin_logit, axis=-1)
    dx = decode_class_to_angle(x_bin, x_res, nb, interval, bin_offset=0.5)
    z_bin = jnp.argmax(z_bin_logit, axis=-1)
    dz = decode_class_to_angle(z_bin, z_res, nb, interval, bin_offset=0.5)

    px = anchors[..., 0] - half_range + dx
    pz = anchors[..., 2] - half_range + dz
    py = anchors[..., 1] + rest[..., 0]
    ctr = jnp.stack([px, py, pz], axis=-1)
    size = jnp.maximum(anchors[..., 3:6] + rest[..., 1:4], 0.1)
    angle_bin = jnp.argmax(det_angle_cls, axis=-1)
    pred_angle = anchors[..., 6] + decode_class_to_angle(
        angle_bin, det_angle_res, num_angle_cls, TWO_PI / num_angle_cls
    )
    return jnp.concatenate([ctr, size, pred_angle[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# dispatcher (mirrors builder/encoder_builder.py)
# ---------------------------------------------------------------------------

class BoxCoder:
    """Config-driven encode/decode over [bs, points, cls, ...] tensors."""

    def __init__(self, method: str, num_angle_cls: int,
                 half_range: float = 3.0, num_bins: int = 12):
        self.method = method
        self.num_angle_cls = num_angle_cls
        self.half_range = half_range
        self.num_bins = num_bins
        encoders: dict[str, Callable] = {
            "Dist-Anchor-free": encode_dist_anchor_free,
            "Dist-Anchor": encode_dist_anchor,
            "Log-Anchor": encode_log_anchor,
            "Bin-Anchor": partial(
                encode_bin_anchor, half_range=half_range, num_bins=num_bins
            ),
        }
        self._encode = encoders[method]

    @property
    def reg_channels(self) -> int:
        return 6 if self.method != "Bin-Anchor" else self.num_bins * 4 + 4

    def encode(self, center_xyz: Array, gt_boxes: Array, anchors: Array):
        """center_xyz [bs, pts, 3]; gt_boxes/anchors [bs, pts, cls, 7]
        -> (target [bs, pts, cls, 6|8], angle_cls int, angle_res)."""
        bs, pts, cls_num, _ = gt_boxes.shape
        gt_flat = gt_boxes.reshape(bs, pts * cls_num, 7)
        an_flat = anchors.reshape(bs, pts * cls_num, -1)
        gt_ctr, gt_size = gt_flat[..., 0:3], gt_flat[..., 3:6]
        if self.method == "Dist-Anchor-free":
            # cls_num == 1 in anchor-free mode; center_xyz is the per-point anchor
            enc_ctr, enc_size = self._encode(gt_ctr, gt_size, center_xyz)
            gt_angle = gt_boxes[..., 6]
        else:
            enc_ctr, enc_size = self._encode(
                gt_ctr, gt_size, an_flat[..., 0:3], an_flat[..., 3:6]
            )
            gt_angle = gt_boxes[..., 6] - anchors[..., 6]
        enc_ctr = enc_ctr.reshape(bs, pts, cls_num, -1)
        enc_size = enc_size.reshape(bs, pts, cls_num, -1)
        angle_cls, angle_res = encode_angle_to_class(gt_angle, self.num_angle_cls)
        target = jnp.concatenate([enc_ctr, enc_size], axis=-1)
        return target, angle_cls, angle_res

    def decode(self, center_xyz: Array, det_offset: Array, det_angle_cls: Array,
               det_angle_res: Array, anchors: Array) -> Array:
        """-> pred boxes_3d [bs, pts, cls, 7]."""
        bs, pts, cls_num = det_offset.shape[:3]
        off = det_offset.reshape(bs, pts * cls_num, -1)
        a_cls = det_angle_cls.reshape(bs, pts * cls_num, self.num_angle_cls)
        a_res = det_angle_res.reshape(bs, pts * cls_num, self.num_angle_cls)
        an = anchors.reshape(bs, pts * cls_num, -1)
        if self.method == "Dist-Anchor-free":
            out = decode_dist_anchor_free(
                center_xyz, off, a_cls, a_res, self.num_angle_cls
            )
        elif self.method == "Dist-Anchor":
            out = decode_dist_anchor(off, a_cls, a_res, an, self.num_angle_cls)
        elif self.method == "Log-Anchor":
            out = decode_log_anchor(off, a_cls, a_res, an, self.num_angle_cls)
        else:
            out = decode_bin_anchor(
                off, a_cls, a_res, an, self.num_angle_cls,
                self.half_range, self.num_bins,
            )
        return out.reshape(bs, pts, cls_num, 7)


# ---------------------------------------------------------------------------
# anchors (per-class mean sizes; reference lib/utils/model_util.py:19-49)
# ---------------------------------------------------------------------------

MEAN_SIZES = {  # class -> (l, h, w)
    "Kitti_Car": (3.88311640418, 1.62856739989, 1.52563191462),
    "Kitti_Van": (5.06763659, 1.9007158, 2.20532825),
    "Kitti_Truck": (10.13586957, 2.58549199, 3.2520595),
    "Kitti_Pedestrian": (0.84422524, 1.76255119, 0.66068622),
    "Kitti_Person_sitting": (0.80057803, 1.27450867, 0.5983815),
    "Kitti_Cyclist": (1.76282397, 1.73698127, 0.59706367),
    "Kitti_Tram": (16.17150617, 2.53246914, 3.53079012),
    "Kitti_Misc": (3.64300781, 1.54298177, 1.92320313),
    "NuScenes_child": (0.527759, 1.376287, 0.513003),
    "NuScenes_barrier": (0.494674, 0.988850, 2.512046),
    "NuScenes_bicycle": (1.698427, 1.293067, 0.604398),
    "NuScenes_bus": (11.180965, 3.495353, 2.94905),
    "NuScenes_car": (4.619270, 1.735112, 1.960518),
    "NuScenes_construction_vehicle": (6.479316, 3.174820, 2.820066),
    "NuScenes_motorcycle": (2.110251, 1.464422, 0.776560),
    "NuScenes_pedestrian": (0.727708, 1.772415, 0.669095),
    "NuScenes_traffic_cone": (0.414219, 1.076862, 0.408734),
    "NuScenes_trailer": (12.283108, 3.865766, 2.922243),
    "NuScenes_truck": (6.885711, 2.826359, 2.509883),
    "Lyft_car": (4.756137, 1.718259, 1.922855),
    "Lyft_pedestrian": (0.798200, 1.777827, 0.770559),
    "Lyft_animal": (0.775029, 0.573300, 0.385750),
    "Lyft_other_vehicle": (8.217489, 3.234986, 2.790774),
    "Lyft_bus": (12.328907, 3.433031, 2.950655),
    "Lyft_motorcycle": (2.368642, 1.583713, 0.978719),
    "Lyft_truck": (10.333140, 3.463256, 2.843518),
    "Lyft_emergency_vehicle": (5.758920, 2.294880, 2.304800),
    "Lyft_bicycle": (1.753566, 1.444639, 0.630577),
}


class AnchorGenerator:
    """Per-point anchors: anchor-based (mean class sizes, y shifted to the
    bottom face by +h/2 like reference generate_anchors.py:33) or anchor-free
    (the point itself)."""

    def __init__(self, dataset_type: str, cls_list, method: str):
        prefix = {"KITTI": "Kitti", "NuScenes": "NuScenes", "Lyft": "Lyft"}[
            dataset_type
        ]
        self.cls_list = list(cls_list)
        self.sizes = jnp.asarray(
            [MEAN_SIZES[f"{prefix}_{c}"] for c in self.cls_list], jnp.float32
        )  # [cls, 3]
        self.anchor_free = method.endswith("free")
        self.num_anchors = len(self.cls_list)

    def __call__(self, points: Array) -> Array:
        """points [bs, n, 3] -> anchors [bs, n, cls, 7] (or [bs, n, 1, 3])."""
        if self.anchor_free:
            return points[:, :, None, :]
        bs, n, _ = points.shape
        cls_num = self.num_anchors
        sizes = jnp.broadcast_to(self.sizes[None, None], (bs, n, cls_num, 3))
        ctr = jnp.broadcast_to(points[:, :, None, :], (bs, n, cls_num, 3))
        # anchor y: bottom face at point y + h/2 (reference shifts the anchor
        # center down so the box straddles the point vertically)
        y = ctr[..., 1] + sizes[..., 1] / 2.0
        ctr = jnp.concatenate([ctr[..., 0:1], y[..., None], ctr[..., 2:3]], axis=-1)
        ry = jnp.zeros((bs, n, cls_num, 1), points.dtype)
        return jnp.concatenate([ctr, sizes, ry], axis=-1)
