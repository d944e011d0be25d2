"""Box codec round-trips + angle binning."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssd3d.core import box_coders as bc

from conftest import random_boxes


def test_angle_roundtrip(rng):
    angles = rng.uniform(-10, 10, size=(64,)).astype(np.float32)
    cls, res = bc.encode_angle_to_class(jnp.asarray(angles), 12)
    cls, res = np.asarray(cls), np.asarray(res)
    assert cls.min() >= 0 and cls.max() < 12
    assert np.abs(res).max() <= 0.5 + 1e-5
    # decode with per-bin residual layout
    res_full = np.zeros((64, 12), np.float32)
    res_full[np.arange(64), cls] = res
    dec = np.asarray(
        bc.decode_class_to_angle(
            jnp.asarray(cls), jnp.asarray(res_full), 12, 2 * np.pi / 12
        )
    )
    np.testing.assert_allclose(
        np.mod(dec, 2 * np.pi), np.mod(angles, 2 * np.pi), atol=1e-4
    )


@pytest.mark.parametrize("method", ["Dist-Anchor-free", "Dist-Anchor", "Log-Anchor"])
def test_codec_roundtrip(rng, method):
    coder = bc.BoxCoder(method, num_angle_cls=12)
    bs, pts = 2, 16
    gt = np.stack([random_boxes(rng, pts) for _ in range(bs)])[:, :, None]  # cls=1
    points = gt[:, :, 0, :3] + rng.uniform(-0.5, 0.5, (bs, pts, 3)).astype(np.float32)
    if method == "Dist-Anchor-free":
        anchors = points[:, :, None]
    else:
        gen = bc.AnchorGenerator("KITTI", ("Car",), method)
        anchors = np.asarray(gen(jnp.asarray(points)))

    target, acls, ares = coder.encode(
        jnp.asarray(points), jnp.asarray(gt), jnp.asarray(anchors)
    )
    # build per-bin prediction tensors from the encoded targets
    acls_np = np.asarray(acls)
    onehot = np.eye(12, dtype=np.float32)[acls_np] * 100.0  # logits
    res_full = np.eye(12, dtype=np.float32)[acls_np] * np.asarray(ares)[..., None]
    dec = np.asarray(
        coder.decode(
            jnp.asarray(points),
            target,
            jnp.asarray(onehot),
            jnp.asarray(res_full),
            jnp.asarray(anchors),
        )
    )
    gt_np = gt.copy()
    np.testing.assert_allclose(dec[..., :6], gt_np[..., :6], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.mod(dec[..., 6], 2 * np.pi),
        np.mod(gt_np[..., 6], 2 * np.pi),
        atol=1e-3,
    )


def test_bin_anchor_roundtrip(rng):
    coder = bc.BoxCoder("Bin-Anchor", num_angle_cls=12, half_range=3.0, num_bins=12)
    bs, pts = 1, 8
    gt = np.stack([random_boxes(rng, pts) for _ in range(bs)])[:, :, None]
    points = gt[:, :, 0, :3] + rng.uniform(-1.5, 1.5, (bs, pts, 3)).astype(np.float32)
    gen = bc.AnchorGenerator("KITTI", ("Car",), "Bin-Anchor")
    anchors = np.asarray(gen(jnp.asarray(points)))

    target, acls, ares = coder.encode(
        jnp.asarray(points), jnp.asarray(gt), jnp.asarray(anchors)
    )
    t = np.asarray(target)  # [bs, pts, 1, 8] = xbin,xres,zbin,zres,yres,3size
    nb = 12
    pred = np.zeros((bs, pts, 1, nb * 4 + 4), np.float32)
    xbin = t[..., 0].astype(int)
    xres = t[..., 1]
    zbin = t[..., 2].astype(int)
    zres = t[..., 3]
    eye = np.eye(nb, dtype=np.float32)
    pred[..., 0 * nb:1 * nb] = eye[xbin] * 100.0
    pred[..., 1 * nb:2 * nb] = eye[xbin] * xres[..., None]
    pred[..., 2 * nb:3 * nb] = eye[zbin] * 100.0
    pred[..., 3 * nb:4 * nb] = eye[zbin] * zres[..., None]
    pred[..., 4 * nb:] = t[..., 4:]

    acls_np = np.asarray(acls)
    onehot = np.eye(12, dtype=np.float32)[acls_np] * 100.0
    res_full = np.eye(12, dtype=np.float32)[acls_np] * np.asarray(ares)[..., None]
    dec = np.asarray(
        coder.decode(
            jnp.asarray(points),
            jnp.asarray(pred),
            jnp.asarray(onehot),
            jnp.asarray(res_full),
            jnp.asarray(anchors),
        )
    )
    np.testing.assert_allclose(dec[..., :6], gt[..., :6], rtol=1e-3, atol=2e-3)


def test_anchor_generator_shapes():
    gen = bc.AnchorGenerator("KITTI", ("Car", "Pedestrian", "Cyclist"), "Dist-Anchor")
    pts = jnp.zeros((2, 10, 3))
    out = gen(pts)
    assert out.shape == (2, 10, 3, 7)
    # anchor y is shifted down by h/2 (bottom-face convention)
    assert float(out[0, 0, 0, 1]) == pytest.approx(1.62856739989 / 2, rel=1e-5)

    gen_free = bc.AnchorGenerator("KITTI", ("Car",), "Dist-Anchor-free")
    out = gen_free(pts)
    assert out.shape == (2, 10, 1, 3)
