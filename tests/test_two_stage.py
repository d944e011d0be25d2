"""Two-stage (PointRCNN) detector: forward, proposals, pooling, train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd3d.config import load_cfg
from ssd3d.models.two_stage import build_two_stage
from ssd3d.train.two_stage_step import TwoStageGraph

from conftest import random_boxes


def prcnn_cfg(only_first=False):
    """Shrunk PointRCNN config derived from the reference tiny yamls."""
    cfg = load_cfg("/root/reference/configs/kitti/pointrcnn/tiny_pointrcnn_stage2.yaml")
    cfg.MODEL.ONLY_FIRST_STAGE = only_first
    cfg.MODEL.POINTS_NUM_FOR_TRAINING = 1024
    arch = cfg.MODEL.NETWORK.FIRST_STAGE.ARCHITECTURE
    for layer, npt in zip(arch[:4], [256, 64, 16, 8]):
        layer[8] = [npt]
        layer[4] = [[8, 8], [8, 8]]
        layer[3] = [4, 8]
        layer[15] = 16
    for layer in arch[4:]:  # FP layers
        layer[4] = [16, 16]
    cfg.MODEL.NETWORK.FIRST_STAGE.HEAD = [[[8], [8], "conv1d", [], True, "Det", "rpn_head"]]
    arch2 = cfg.MODEL.NETWORK.SECOND_STAGE.ARCHITECTURE
    arch2[0][8] = [32]
    arch2[0][3] = [8]
    arch2[0][4] = [[8, 8]]
    arch2[1][8] = [8]
    arch2[1][3] = [8]
    arch2[1][4] = [[8, 16]]
    arch2[2][4] = [16, 32]
    cfg.MODEL.NETWORK.SECOND_STAGE.HEAD = [[[0], [4], "conv1d", [16], True, "Det", "rcnn_head"]]
    cfg.MODEL.NETWORK.FIRST_STAGE.POINTS_POOLER = [
        "RegionPool", ["mask", "dist"], [8], 64, 1.0, [6, 6, 6, 10], [8],
        True, "roi_pool",
    ]
    cfg.MODEL.FIRST_STAGE.MAX_OUTPUT_NUM = 32
    cfg.MODEL.SECOND_STAGE.MINIBATCH_NUM = 8
    cfg.MODEL.SECOND_STAGE.CLASSIFICATION_POS_IOU = 0.3
    cfg.MODEL.SECOND_STAGE.CLASSIFICATION_NEG_IOU = 0.2
    return cfg


def make_batch(rng, bs=1, n=1024):
    gt = np.zeros((bs, 8, 7), np.float32)
    gt[:, 0] = [2.0, 1.5, 10.0, 3.9, 1.6, 1.6, 0.3]
    gt[:, 1] = [-6.0, 1.5, 18.0, 3.9, 1.6, 1.6, -0.7]
    labels = np.zeros((bs, 8), np.int32)
    labels[:, :2] = 1
    pts = rng.uniform(-1, 1, (bs, n, 4)).astype(np.float32) * np.array(
        [15, 1.5, 10, 1], np.float32
    )
    pts[..., 2] += 14
    for g in range(2):
        sel = slice(g * 150, (g + 1) * 150)
        pts[:, sel, 0] = gt[:, g: g + 1, 0] + rng.uniform(-1.5, 1.5, (bs, 150))
        pts[:, sel, 1] = gt[:, g: g + 1, 1] - rng.uniform(0, 1.5, (bs, 150))
        pts[:, sel, 2] = gt[:, g: g + 1, 2] + rng.uniform(-0.7, 0.7, (bs, 150))
    return {
        "points": jnp.asarray(pts),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
    }


@pytest.fixture(scope="module")
def two_stage():
    cfg = prcnn_cfg()
    model, rpn_spec, rcnn_spec = build_two_stage(cfg, nms_pre_topk=256)
    batch = make_batch(np.random.RandomState(0))
    variables = model.init(
        jax.random.PRNGKey(0), batch["points"], False, 0.9, rpn_spec=rpn_spec
    )
    return cfg, model, rpn_spec, rcnn_spec, variables, batch


def test_full_forward_shapes(two_stage):
    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    out = model.apply(variables, batch["points"], False, 0.9, rpn_spec=rpn_spec)
    p = cfg.MODEL.FIRST_STAGE.MAX_OUTPUT_NUM
    assert out["proposals"].shape == (1, p, 7)
    assert out["rpn"]["cls"].shape == (1, 1024, 1)  # per-point RPN
    assert out["rpn"]["offset"].shape[-1] == 12 * 4 + 4  # Bin-Anchor channels
    assert out["cls"].shape == (1, p, 2)  # softmax refinement head
    assert out["offset"].shape == (1, p, 1, 6 * 4 + 4)  # 6-bin stage2
    det = rcnn_spec.final_detections(out)
    assert det["boxes"].shape == (1, cfg.MODEL.SECOND_STAGE.MAX_OUTPUT_NUM, 7)


def test_proposals_cover_objects(two_stage):
    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    out = model.apply(variables, batch["points"], False, 0.9, rpn_spec=rpn_spec)
    # untrained proposals are garbage boxes, but they must be finite and
    # validity-masked
    assert bool(jnp.isfinite(out["proposals"]).all())
    assert int(out["proposal_valid"].sum()) > 0


def _changed(tree_a, tree_b):
    return any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b))
    )


@pytest.mark.slow
def test_two_stage_train_step(two_stage):
    """End-to-end mode (no prefixes): stage-1 losses train; stage-2 losses
    exist but are zero until the RPN produces overlapping proposals — the
    reference behaves identically (nmask needs IoU >= 0.05)."""
    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    cfg = cfg.clone()
    cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX = []
    cfg.TRAIN.CONFIG.TRAIN_LOSS_PREFIX = []
    graph = TwoStageGraph.build(cfg, model, rpn_spec, rcnn_spec)
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    step = jax.jit(graph.train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    keys = set(metrics)
    assert any(k.startswith("loss_stage0/") for k in keys)
    assert any(k.startswith("loss_stage1/") for k in keys)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["total"]) > 0  # stage-1 losses active

    first = float(metrics["total"])
    for _ in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["total"]) < first  # overfits the fixed batch


@pytest.mark.slow
def test_stage2_freeze(two_stage):
    """TRAIN_PARAM_PREFIX ['rcnn', 'roi'] freezes the RPN; contrast with the
    unfrozen run where the RPN moves."""
    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    assert cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX == ["rcnn", "roi"]
    assert cfg.TRAIN.CONFIG.TRAIN_LOSS_PREFIX == ["loss_stage1"]
    graph = TwoStageGraph.build(cfg, model, rpn_spec, rcnn_spec)
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    before = jax.device_get(state.params)
    state2, _ = jax.jit(graph.train_step)(state, batch, jax.random.PRNGKey(1))
    after = jax.device_get(state2.params)
    assert not _changed(before["rpn_backbone"], after["rpn_backbone"])
    assert not _changed(before["rpn_head"], after["rpn_head"])

    # contrast: without freezing, stage-1 losses move the RPN
    cfg2 = cfg.clone()
    cfg2.TRAIN.CONFIG.TRAIN_PARAM_PREFIX = []
    cfg2.TRAIN.CONFIG.TRAIN_LOSS_PREFIX = []
    graph2 = TwoStageGraph.build(cfg2, model, rpn_spec, rcnn_spec)
    state = graph2.init_state(jax.random.PRNGKey(0), batch["points"])
    before = jax.device_get(state.params)
    state2, _ = jax.jit(graph2.train_step)(state, batch, jax.random.PRNGKey(1))
    after = jax.device_get(state2.params)
    assert _changed(before["rpn_backbone"], after["rpn_backbone"])


@pytest.mark.slow
def test_only_first_stage():
    cfg = prcnn_cfg(only_first=True)
    model, rpn_spec, rcnn_spec = build_two_stage(cfg, nms_pre_topk=256)
    batch = make_batch(np.random.RandomState(1))
    cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX = []
    cfg.TRAIN.CONFIG.TRAIN_LOSS_PREFIX = []
    graph = TwoStageGraph.build(cfg, model, rpn_spec, rcnn_spec)
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    state, metrics = jax.jit(graph.train_step)(state, batch, jax.random.PRNGKey(1))
    assert all(k.startswith("loss_stage0/") or k in ("total", "lr") for k in metrics)
    assert np.isfinite(float(metrics["total"]))


def test_chunked_rcnn_infer_matches_unchunked(two_stage):
    """TEST.RCNN_INFER_CHUNK bounds inference HBM by lax.map-ing the RCNN
    over proposal chunks; the detections must match the all-at-once path
    (the full-proposal pooled gather OOMs a 16 GiB chip at the shipped
    1000-proposal setting)."""
    from ssd3d.models.api import build_pipeline

    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    cfg_full = cfg.clone()
    cfg_full.TEST.RCNN_INFER_CHUNK = 0
    cfg_chunk = cfg.clone()
    cfg_chunk.TEST.RCNN_INFER_CHUNK = 8  # 32 proposals -> 4 chunks
    pipe_full = build_pipeline(cfg_full, nms_pre_topk=256)
    pipe_chunk = build_pipeline(cfg_chunk, nms_pre_topk=256)
    det_full = jax.jit(pipe_full.infer)(variables, batch["points"])
    det_chunk = jax.jit(pipe_chunk.infer)(variables, batch["points"])
    assert set(det_full) == set(det_chunk)
    for k in det_full:
        np.testing.assert_allclose(
            np.asarray(det_full[k]), np.asarray(det_chunk[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


@pytest.fixture(scope="module")
def two_stage_pp():
    """Same shrunk PointRCNN config but with the STD voxelizing pooler
    (PointsPool: interior points -> l*h*w grid + VFE, reference
    points_pooler.py:64) so the RCNN consumes voxel pillars, not raw
    interior points."""
    cfg = prcnn_cfg()
    cfg.MODEL.NETWORK.FIRST_STAGE.POINTS_POOLER = [
        "PointsPool", ["mask", "dist"], [8], 64, 1.0, [4, 4, 4, 4], [8],
        True, "roi_pool",
    ]
    model, rpn_spec, rcnn_spec = build_two_stage(cfg, nms_pre_topk=256)
    batch = make_batch(np.random.RandomState(2))
    variables = model.init(
        jax.random.PRNGKey(0), batch["points"], False, 0.9, rpn_spec=rpn_spec
    )
    return cfg, model, rpn_spec, rcnn_spec, variables, batch


@pytest.mark.slow
def test_points_pool_forward_shapes(two_stage_pp):
    """PointsPool hands the RCNN one point per voxel (l*h*w of them), with
    voxel-center xyz as the pillar coordinates."""
    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage_pp
    out = model.apply(variables, batch["points"], False, 0.9, rpn_spec=rpn_spec)
    p = cfg.MODEL.FIRST_STAGE.MAX_OUTPUT_NUM
    assert out["proposals"].shape == (1, p, 7)
    assert out["cls"].shape == (1, p, 2)
    assert bool(jnp.isfinite(out["cls"]).all())
    det = rcnn_spec.final_detections(out)
    assert det["boxes"].shape == (1, cfg.MODEL.SECOND_STAGE.MAX_OUTPUT_NUM, 7)
    assert bool(jnp.isfinite(det["boxes"]).all())


def test_points_pool_voxel_semantics():
    """Oracle check of the pooler itself: points dropped into a known box
    land in the right voxel cells, empty voxels stay zeroed, and the voxel
    centers tile the canonical box frame."""
    from ssd3d.models.two_stage import PointsPool

    pool = PointsPool(
        sample_pts_num=32, context_range=1.0, info_keys=("mask", "dist"),
        align_channels=(4,), grid=(2, 2, 2, 4), vfe_channels=(4,), bn=False,
    )
    # one axis-aligned proposal: bottom-ctr (0, 1, 10), l=4 h=2 w=4, ry=0.
    # expand_boxes adds the 1.0 context -> grid frame is l=5 h=3 w=5,
    # canonical x/z in [-2.5, 2.5], y in [-3, 0].
    proposals = jnp.asarray([[[0.0, 1.0, 10.0, 4.0, 2.0, 4.0, 0.0]]])
    # two interior points in distinct canonical octants + one far outlier
    pts = jnp.asarray([[
        [-1.0, 0.5, 9.0, 0.0],   # canonical (-1, -0.5, -1) -> vox (0,1,0)=2
        [1.0, -1.0, 11.0, 0.0],  # canonical (1, -2, 1)     -> vox (1,0,1)=5
        [50.0, 0.0, 50.0, 0.0],  # outside
    ]])
    feats = jnp.ones((1, 3, 2), jnp.float32)
    mask = jnp.asarray([[[1.0], [1.0], [0.0]]])
    variables = pool.init(jax.random.PRNGKey(0), pts[..., :3], feats, mask,
                          proposals, False)
    out, has = pool.apply(variables, pts[..., :3], feats, mask, proposals,
                          False)
    gl = gh = gw = 2
    assert out.shape == (1, gl * gh * gw, 3 + 4)  # vox ctr + vfe channels
    assert int(has.sum()) == 1  # the proposal contains points
    ctrs = np.asarray(out[0, :, :3])
    # voxel centers tile the EXPANDED box: x/z at +-1.25, y at -2.25/-0.75
    assert sorted(set(np.round(ctrs[:, 0], 3))) == [-1.25, 1.25]
    assert sorted(set(np.round(ctrs[:, 1], 3))) == [-2.25, -0.75]
    assert sorted(set(np.round(ctrs[:, 2], 3))) == [-1.25, 1.25]
    # only the two voxels holding the interior points may carry features;
    # every other voxel is exactly zeroed by the occupancy mask
    feat_norm = np.abs(np.asarray(out[0, :, 3:])).sum(-1)
    empty = [i for i in range(gl * gh * gw) if i not in (2, 5)]
    np.testing.assert_array_equal(feat_norm[empty], 0.0)


@pytest.mark.slow
def test_points_pool_train_step(two_stage_pp):
    """A full two-stage train step through the PointsPool path: losses
    finite, and repeating the step overfits the fixed batch."""
    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage_pp
    cfg = cfg.clone()
    cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX = []
    cfg.TRAIN.CONFIG.TRAIN_LOSS_PREFIX = []
    graph = TwoStageGraph.build(cfg, model, rpn_spec, rcnn_spec)
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    step = jax.jit(graph.train_step)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))

    def stage0(m):
        return sum(float(v) for k, v in m.items() if k.startswith("loss_stage0/"))

    first = stage0(metrics)
    for _ in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
    # the RPN overfits the fixed batch; the total can transiently rise as
    # stage-2 losses switch on once proposals start overlapping GT
    assert stage0(metrics) < first


def test_infer_carries_proposals_and_recall(two_stage):
    """Two-stage inference must expose the stage-1 proposals so the
    evaluator can report proposal recall (the quantity refinement cannot
    recover; reference TEST_MODE 'Recall', kitti_dataloader.py:385-408)."""
    from ssd3d.eval.predictions import proposal_recall
    from ssd3d.models.api import build_pipeline

    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    pipe = build_pipeline(cfg, nms_pre_topk=256)
    det = jax.jit(pipe.infer)(variables, batch["points"])
    assert "proposals" in det and "proposals_valid" in det
    assert det["proposals"].shape[-1] == 7
    assert det["proposals"].shape[:2] == det["proposals_valid"].shape

    # recall oracle: proposals == GT -> 1.0; far-away junk -> 0.0
    gts = [np.array([[1.0, 1.5, 10.0, 3.9, 1.56, 1.6, 0.3],
                     [-4.0, 1.5, 20.0, 3.9, 1.56, 1.6, -1.2]], np.float32)]
    d, t, r = proposal_recall(gts, gts)
    assert (d, t, r) == (2, 2, 1.0)
    junk = [gts[0] + np.float32(50.0)]
    d, t, r = proposal_recall(junk, gts)
    assert (d, t, r) == (0, 2, 0.0)


def test_proposal_recall_fixed_shape_tuple_form():
    """The evaluator feeds (fixed [P,7] buffer, valid mask) pairs so the
    IoU jit compiles once for the whole split (per-scan boolean filtering
    caused a recompile per unique shape through the TPU tunnel)."""
    from ssd3d.eval.predictions import proposal_recall

    gt1 = np.array([[1.0, 1.5, 10.0, 3.9, 1.56, 1.6, 0.3]], np.float32)
    gt2 = np.array([[1.0, 1.5, 10.0, 3.9, 1.56, 1.6, 0.3],
                    [-4.0, 1.5, 20.0, 3.9, 1.56, 1.6, -1.2]], np.float32)
    P = 8
    props = np.zeros((P, 7), np.float32)
    props[0], props[1] = gt1[0], gt2[1]
    valid = np.zeros(P, bool)
    valid[:2] = True
    d, t, r = proposal_recall([(props, valid), (props, valid)], [gt1, gt2])
    assert (d, t) == (3, 3)
    d, t, r = proposal_recall([(props, np.zeros(P, bool))], [gt2])
    assert (d, t, r) == (0, 2, 0.0)  # masked proposals never count


@pytest.mark.slow
def test_two_stage_train_step_sharded_multichip(two_stage):
    """The two-stage train step — in-graph class-unaware NMS →
    gather_by_mask → RoI pooling → RCNN losses — compiled and executed over
    an 8-device mesh with the batch sharded on 'data'. Per-example ops under
    batch sharding are exactly where GSPMD can silently mis-partition; the
    sharded losses must match the single-device run on the same batch
    (reference two-stage semantics: double_stage_detector.py:166-219 under
    SURVEY.md §2.7's DP strategy)."""
    from ssd3d.parallel import batch_sharding, make_mesh, replicated

    cfg, model, rpn_spec, rcnn_spec, variables, batch = two_stage
    cfg = cfg.clone()
    cfg.TRAIN.CONFIG.TRAIN_PARAM_PREFIX = []
    cfg.TRAIN.CONFIG.TRAIN_LOSS_PREFIX = []
    graph = TwoStageGraph.build(cfg, model, rpn_spec, rcnn_spec)

    rng = np.random.RandomState(3)
    batch8 = make_batch(rng, bs=8)
    state = graph.init_state(jax.random.PRNGKey(0), batch8["points"][:1])

    # single-device truth
    st_1, m_1 = jax.jit(graph.train_step)(
        state, batch8, jax.random.PRNGKey(1)
    )

    mesh = make_mesh(8)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    sh_batch = {k: jax.device_put(v, bsh) for k, v in batch8.items()}
    step = jax.jit(
        graph.train_step,
        in_shardings=(rep, {k: bsh for k in sh_batch}, rep),
        out_shardings=(rep, rep),
    )
    st_8, m_8 = step(jax.device_put(state, rep), sh_batch,
                     jax.random.PRNGKey(1))

    assert int(st_8.step) == 1
    for k in m_1:
        a, b = float(m_1[k]), float(m_8[k])
        assert np.isfinite(b), (k, b)
        if k in ("grad_norm", "param_norm"):
            continue  # gradient-derived; see the comment below
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5, err_msg=k)
    # params identical across devices (replicated update). Gradients/params
    # are NOT compared against the single-device run: with an untrained RPN,
    # near-duplicate proposals tie in NMS, reduction-order ULPs flip which
    # index survives, and the same loss routes gradient through different
    # upstream paths — loss equality is the sharding-correctness signal.
    leaf = jax.tree.leaves(st_8.params)[0]
    assert leaf.sharding.is_fully_replicated

    # FSDP (ZeRO-3 via GSPMD) on the same mesh must agree with dp tightly
    # (same topology, same discrete picks)
    from ssd3d.parallel import fsdp_shardings

    state_sh = fsdp_shardings(state, mesh, min_size=1 << 8)
    assert any(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(state_sh)
    )
    step_f = jax.jit(
        graph.train_step,
        in_shardings=(state_sh, {k: bsh for k in sh_batch}, rep),
        out_shardings=(state_sh, rep),
    )
    st_f, m_f = step_f(jax.device_put(state, state_sh), sh_batch,
                       jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_f["total"]), float(m_8["total"]),
                               rtol=1e-5)
    assert int(st_f.step) == 1
