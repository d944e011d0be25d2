"""Target assignment, losses, and the sharded train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssd3d.config import load_cfg
from ssd3d.core.geometry import points_in_boxes
from ssd3d.models import build_detector
from ssd3d.train.assigner import AssignerConfig, assign_targets, vote_targets
from ssd3d.train.schedules import bn_momentum, learning_rate
from ssd3d.train.train_step import TrainGraph
from ssd3d.parallel import make_mesh, batch_sharding, replicated

from conftest import random_boxes
from test_model import tiny_cfg


def _mask_assign_oracle(points, anchors, gt_boxes, gt_labels, sample_range):
    """Numpy oracle for Mask assignment, minibatch -1, cls_num=1
    (reference gt_sampler.py:168-259 semantics)."""
    pts_num = points.shape[0]
    valid = np.any(gt_boxes != 0, axis=-1)
    inside = np.asarray(
        points_in_boxes(jnp.asarray(points), jnp.asarray(gt_boxes))
    ) & valid[None]
    sampled = np.argmax(inside, axis=-1)
    assigned = gt_boxes[sampled]
    dist = np.linalg.norm(anchors[:, 0, :3] - assigned[:, :3], axis=-1)
    pmask = (inside.any(-1) & (dist <= sample_range)).astype(np.float32)
    nmask = (~inside.any(-1)).astype(np.float32)
    return sampled, pmask, nmask, assigned


def test_mask_assign_matches_oracle(rng):
    gt = random_boxes(rng, 5)
    gt[3:] = 0  # padding rows
    labels = np.array([1, 1, 1, 0, 0], np.int32)
    pts = rng.uniform(-20, 20, (64, 3)).astype(np.float32)
    pts[:10] = gt[0, :3]
    pts[:10, 1] -= gt[0, 4] / 2  # inside box 0
    anchors = pts[:, None, :]  # anchor-free

    cfg = AssignerConfig(
        method="Mask", iou_sample_type="3D", minibatch_size=-1,
        positive_ratio=0.25, pos_iou=0.7, neg_iou=0.55,
        effective_sample_range=10.0,
    )
    out = assign_targets(
        cfg, jax.random.PRNGKey(0), jnp.asarray(pts)[None],
        jnp.asarray(anchors)[None], jnp.asarray(gt)[None],
        jnp.asarray(labels)[None],
    )
    sampled, pmask, nmask, assigned = _mask_assign_oracle(
        pts, anchors, gt, labels, 10.0
    )
    np.testing.assert_array_equal(np.asarray(out["pmask"])[0, :, 0], pmask)
    np.testing.assert_array_equal(np.asarray(out["nmask"])[0, :, 0], nmask)
    np.testing.assert_allclose(
        np.asarray(out["gt_boxes"])[0, :, 0], assigned, atol=1e-5
    )
    # positive points carry class 1, negatives 0
    got_cls = np.asarray(out["gt_cls"])[0]
    np.testing.assert_array_equal(got_cls[:10], 1)
    assert (got_cls * (1 - pmask) == 0).all()


def _iou_assign_oracle(points, anchors, gt_boxes, gt_labels, iou_matrix,
                       pos_iou, neg_iou, sample_range):
    """Numpy oracle for IoU assignment, minibatch -1 — a direct port of the
    reference host-side semantics (np_functions/gt_sampler.py:65-165
    iou_assign_targets_anchors_np): filter valid GT, point-membership argmax
    assignment, one-hot IoU selection, label-mismatch entries forced to -1
    ("ignored"), pos = IoU>=pos_iou within sample range, neg = 0.05<=IoU<neg_iou.
    iou_matrix: [pts, cls, gt] (precomputed, matching the reference's
    externally-supplied calc_iou matrix)."""
    pts_num, cls_num = anchors.shape[:2]
    filter_idx = np.where(np.any(gt_boxes != 0, axis=-1))[0]
    gt_l = gt_labels[filter_idx]
    gt_b = gt_boxes[filter_idx]
    iou = iou_matrix[:, :, filter_idx]

    inside = np.asarray(
        points_in_boxes(jnp.asarray(points), jnp.asarray(gt_b))
    )  # [pts, gt_valid]
    sampled = np.argmax(inside, axis=-1)
    assigned_label = gt_l[sampled] - 1
    assigned_boxes = gt_b[sampled]
    dist = np.linalg.norm(
        anchors[:, :, :3] - assigned_boxes[:, None, :3], axis=-1
    )
    assigned_idx = filter_idx[sampled]

    iou_sel = np.take_along_axis(iou, sampled[:, None, None], axis=-1)[..., 0]
    if cls_num > 1:
        label_mask = (
            np.arange(cls_num)[None, :] == assigned_label[:, None]
        ).astype(np.float32)
    else:
        label_mask = np.ones((pts_num, cls_num), np.float32)
    iou_sel = iou_sel * label_mask + (1.0 - label_mask) * -1.0
    pmask = ((iou_sel >= pos_iou) & (dist <= sample_range)).astype(np.float32)
    nmask = ((iou_sel < neg_iou) & (iou_sel >= 0.05)).astype(np.float32)
    return assigned_idx, pmask, nmask


@pytest.mark.parametrize("sample_type,pos_iou,neg_iou",
                         [("BEV", 0.55, 0.45), ("3D", 0.4, 0.3)])
def test_iou_assign_matches_oracle(rng, sample_type, pos_iou, neg_iou):
    """The IoU-assignment mask algebra (label masking, the -1 ignored
    sentinel, the >=0.05 negative gate, distance gating) against the
    reference numpy semantics on a randomized scene."""
    from ssd3d.core.box_coders import AnchorGenerator
    from ssd3d.core.iou import boxes_iou_bev_3d

    gt = random_boxes(rng, 6)
    # size GTs near the class mean sizes so mean-size anchors genuinely
    # overlap them (labels: 1=Car, 2=Pedestrian)
    gt[0, 3:6] = gt[2, 3:6] = np.array([3.9, 1.55, 1.6]) * (
        1 + rng.uniform(-0.1, 0.1, 3)
    )
    gt[1, 3:6] = gt[3, 3:6] = np.array([0.85, 1.76, 0.66]) * (
        1 + rng.uniform(-0.1, 0.1, 3)
    )
    gt[:4, 6] = rng.uniform(-0.2, 0.2, 4)  # near-axis-aligned vs ry=0 anchors
    gt[4:] = 0  # padding rows
    labels = np.array([1, 2, 1, 2, 0, 0], np.int32)
    # points: some at GT centers (inside), some near misses (anchor overlaps
    # but point outside -> exercises the point-membership-vs-IoU split),
    # some far background
    pts = np.concatenate([
        gt[:4, :3] + np.array([0, -0.3, 0], np.float32),
        gt[:4, :3] + np.array([2.0, -0.3, 0.5], np.float32),
        rng.uniform(-40, 40, (24, 3)).astype(np.float32),
    ])
    gen = AnchorGenerator("KITTI", ("Car", "Pedestrian"), "Dist-Anchor")
    anchors = np.asarray(gen(jnp.asarray(pts)[None]))[0]  # [pts, 2, 7]
    pts_num, cls_num = anchors.shape[:2]

    iou_bev, iou_3d = boxes_iou_bev_3d(
        jnp.asarray(anchors.reshape(-1, 7)), jnp.asarray(gt)
    )
    iou_full = np.asarray(iou_bev if sample_type == "BEV" else iou_3d)
    valid = np.any(gt != 0, axis=-1)
    iou_full = (iou_full * valid[None, :]).reshape(pts_num, cls_num, -1)

    cfg = AssignerConfig(
        method="IoU", iou_sample_type=sample_type, minibatch_size=-1,
        positive_ratio=0.5, pos_iou=pos_iou, neg_iou=neg_iou,
        effective_sample_range=100.0,
    )
    out = assign_targets(
        cfg, jax.random.PRNGKey(0), jnp.asarray(pts)[None],
        jnp.asarray(anchors)[None], jnp.asarray(gt)[None],
        jnp.asarray(labels)[None],
    )
    ref_idx, ref_pmask, ref_nmask = _iou_assign_oracle(
        pts, anchors, gt, labels, iou_full, pos_iou, neg_iou, 100.0
    )
    np.testing.assert_array_equal(np.asarray(out["assigned_idx"])[0], ref_idx)
    np.testing.assert_array_equal(np.asarray(out["pmask"])[0], ref_pmask)
    np.testing.assert_array_equal(np.asarray(out["nmask"])[0], ref_nmask)
    # the scene must actually exercise both mask polarities and both classes
    assert ref_pmask.sum() > 0 and ref_nmask.sum() > 0
    assert ref_pmask[:, 0].sum() > 0 and ref_pmask[:, 1].sum() > 0


def test_minibatch_sampling_counts(rng):
    gt = random_boxes(rng, 2)
    labels = np.ones(2, np.int32)
    pts = np.concatenate(
        [
            np.repeat(gt[0:1, :3], 20, 0) + np.array([0, -gt[0, 4] / 2, 0]),
            rng.uniform(100, 200, (44, 3)),
        ]
    ).astype(np.float32)
    cfg = AssignerConfig(
        method="Mask", iou_sample_type="3D", minibatch_size=16,
        positive_ratio=0.25, pos_iou=0.7, neg_iou=0.55,
        effective_sample_range=1000.0,
    )
    out = assign_targets(
        cfg, jax.random.PRNGKey(1), jnp.asarray(pts)[None],
        jnp.asarray(pts)[None, :, None], jnp.asarray(gt)[None],
        jnp.asarray(labels)[None],
    )
    n_pos = int(np.asarray(out["pmask"]).sum())
    n_neg = int(np.asarray(out["nmask"]).sum())
    assert n_pos == 4  # 16 * 0.25
    assert n_neg == 12  # budget filled
    # different keys give different subsets
    out2 = assign_targets(
        cfg, jax.random.PRNGKey(2), jnp.asarray(pts)[None],
        jnp.asarray(pts)[None, :, None], jnp.asarray(gt)[None],
        jnp.asarray(labels)[None],
    )
    assert not np.array_equal(np.asarray(out["pmask"]), np.asarray(out2["pmask"]))


def test_vote_targets(rng):
    gt = random_boxes(rng, 3)
    gt[2] = 0
    base = np.stack([gt[0, :3], gt[1, :3], [500.0, 0, 0]]).astype(np.float32)
    base[:2, 1] -= 0.1
    mask, target = vote_targets(jnp.asarray(base)[None], jnp.asarray(gt)[None])
    mask, target = np.asarray(mask)[0], np.asarray(target)[0]
    np.testing.assert_array_equal(mask, [1, 1, 0])
    # target points at the volumetric center
    want = gt[0, :3].copy()
    want[1] -= gt[0, 4] / 2
    np.testing.assert_allclose(base[0] + target[0], want, atol=1e-5)


def test_schedules():
    cfg = load_cfg("/root/reference/configs/kitti/3dssd/3dssd.yaml")
    assert float(learning_rate(cfg.SOLVER, 0)) == pytest.approx(0.002)
    assert float(learning_rate(cfg.SOLVER, 64559)) == pytest.approx(0.002)
    assert float(learning_rate(cfg.SOLVER, 64560)) == pytest.approx(0.0002)
    assert float(bn_momentum(cfg.SOLVER, 0)) == pytest.approx(0.5)
    assert float(bn_momentum(cfg.SOLVER, 70000)) == pytest.approx(0.75)


def _tiny_batch(rng, bs=2, n=512, gt_max=6):
    pts = rng.uniform(-1, 1, (bs, n, 4)).astype(np.float32) * 8
    gt = np.stack([random_boxes(rng, gt_max, scale=6.0) for _ in range(bs)])
    gt[:, 4:] = 0  # padding
    labels = np.ones((bs, gt_max), np.int32)
    labels[:, 4:] = 0
    # plant points inside boxes so positives exist
    for b in range(bs):
        for g in range(4):
            pts[b, g * 20:(g + 1) * 20, :3] = gt[b, g, :3]
            pts[b, g * 20:(g + 1) * 20, 1] -= gt[b, g, 4] / 2
    return {
        "points": jnp.asarray(pts),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
    }


@pytest.fixture(scope="module")
def tiny_train():
    cfg = tiny_cfg()
    cfg.MODEL.FIRST_STAGE.CORNER_LOSS = True
    cfg.SOLVER.TYPE = "Adam"
    cfg.SOLVER.BASE_LR = 0.002
    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    return cfg, graph, state, batch


def test_losses_finite_and_complete(tiny_train):
    cfg, graph, state, batch = tiny_train
    total, (loss_dict, _) = graph.compute_losses(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(0), 0.9
    )
    assert set(loss_dict) == {"cls", "offset", "angle", "corner", "vote"}
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    assert float(total) > 0


def test_attention_grouping_train_step(rng):
    """use_attention=True (field 10 of the arch tuple; reference
    layers_util.py:122-130 attention grouping) through a full train step:
    the branch must trace, the loss must be finite, and grads must reach
    the attention layer's MLP."""
    cfg = tiny_cfg()
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    arch[0][10] = True  # first SA layer groups in feature-distance order
    arch[1][10] = True
    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)
    batch = _tiny_batch(np.random.RandomState(2))
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    state2, metrics = jax.jit(graph.train_step)(
        state, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["total"]))
    # layer1 mlp weights must have moved (grads flowed through the
    # attention-ordered grouping)
    before = state.params["backbone"]["layer1"]["mlp0"]["conv0"]["conv"]["kernel"]
    after = state2.params["backbone"]["layer1"]["mlp0"]["conv0"]["conv"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


@pytest.mark.parametrize("activation", ["Sigmoid", "Softmax"])
@pytest.mark.parametrize("loss_type", ["Is-Not", "Focal-loss", "Center-ness"])
def test_cls_activation_loss_matrix(activation, loss_type, rng):
    """Every reachable CLS_ACTIVATION x CLASSIFICATION_LOSS.TYPE YAML
    combination must trace and produce a finite loss (the reference's schema
    admits all six; its own loss_builder.py:70-92 only handles four)."""
    cfg = tiny_cfg()
    cfg.MODEL.FIRST_STAGE.CLS_ACTIVATION = activation
    cfg.MODEL.FIRST_STAGE.CLASSIFICATION_LOSS.TYPE = loss_type
    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)
    batch = _tiny_batch(np.random.RandomState(1))
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    total, (loss_dict, _) = graph.compute_losses(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(0), 0.9
    )
    assert np.isfinite(float(total)), (activation, loss_type)
    assert np.isfinite(float(loss_dict["cls"])) and float(loss_dict["cls"]) >= 0


def test_train_step_decreases_loss(tiny_train):
    cfg, graph, state, batch = tiny_train
    step = jax.jit(graph.train_step)
    rng = jax.random.PRNGKey(42)
    first = None
    for i in range(8):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert int(state.step) == 8


def test_train_step_sharded_multichip(tiny_train):
    """The dryrun_multichip contract: jit the FULL train step over an
    8-device mesh with the batch sharded on 'data'."""
    cfg, graph, state, batch = tiny_train
    mesh = make_mesh(8)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    batch8 = {
        k: jax.device_put(jnp.concatenate([v] * 4, axis=0), bsh)
        for k, v in batch.items()
    }
    state = jax.device_put(state, rep)
    step = jax.jit(
        graph.train_step,
        in_shardings=((rep, {k: bsh for k in batch8}, rep)),
        out_shardings=(rep, rep),
    )
    new_state, metrics = step(state, batch8, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == int(state.step) + 1
    # params identical across devices (replicated update)
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_train_step_fsdp_matches_dp(tiny_train):
    """TPU.PARALLEL_MODE 'fsdp': params + optimizer moments sharded across
    the data axis (ZeRO-3 via GSPMD) produce the same update as the
    replicated step."""
    from ssd3d.parallel import fsdp_shardings

    cfg, graph, state, batch = tiny_train
    mesh = make_mesh(8)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    batch8 = {
        k: jax.device_put(jnp.concatenate([v] * 4, axis=0), bsh)
        for k, v in batch.items()
    }
    rng = jax.random.PRNGKey(0)

    step_dp = jax.jit(
        graph.train_step,
        in_shardings=((rep, {k: bsh for k in batch8}, rep)),
        out_shardings=(rep, rep),
    )
    st_dp, m_dp = step_dp(jax.device_put(state, rep), batch8, rng)

    state_sh = fsdp_shardings(state, mesh, min_size=1 << 8)
    assert any(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(state_sh)
    ), "no leaf sharded — min_size too high for the tiny model"
    step_f = jax.jit(
        graph.train_step,
        in_shardings=((state_sh, {k: bsh for k in batch8}, rep)),
        out_shardings=(state_sh, rep),
    )
    st_f, m_f = step_f(jax.device_put(state, state_sh), batch8, rng)

    np.testing.assert_allclose(float(m_f["total"]), float(m_dp["total"]),
                               rtol=1e-5)
    # updated params numerically identical once gathered
    p_dp = jax.tree.leaves(jax.device_get(st_dp.params))
    p_f = jax.tree.leaves(jax.device_get(st_f.params))
    for a, b in zip(p_dp, p_f):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_train_step_remat_matches(tiny_train):
    """TPU.REMAT_SA_LAYERS recomputes backbone activations in the backward
    pass; losses/grads must be numerically unchanged."""
    cfg, graph, state, batch = tiny_train
    cfg2 = tiny_cfg()
    cfg2.MODEL.FIRST_STAGE.CORNER_LOSS = True
    cfg2.SOLVER.TYPE = "Adam"
    cfg2.SOLVER.BASE_LR = 0.002
    cfg2.TPU.REMAT_SA_LAYERS = True
    model2, spec2 = build_detector(cfg2)
    graph2 = TrainGraph.build(cfg2, model2, spec2)
    state2 = graph2.init_state(jax.random.PRNGKey(0), batch["points"])

    rng = jax.random.PRNGKey(7)
    total1, _ = graph.compute_losses(
        state.params, state.batch_stats, batch, rng, 0.9)
    total2, _ = graph2.compute_losses(
        state2.params, state2.batch_stats, batch, rng, 0.9)
    np.testing.assert_allclose(float(total1), float(total2), rtol=1e-5)

    _, metrics2 = jax.jit(graph2.train_step)(state2, batch, rng)
    assert np.isfinite(float(metrics2["total"]))
