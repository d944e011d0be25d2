"""End-to-end integration: overfit the tiny detector on one synthetic scene
and verify it learns to localize the planted objects; exercise the full
loader -> train step -> eval pipeline (the reference had no such test)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssd3d.core.iou import boxes_iou_bev_3d
from ssd3d.models import build_detector
from ssd3d.train.train_step import TrainGraph

from test_model import tiny_cfg


@pytest.mark.slow
def test_overfit_single_scene():
    cfg = tiny_cfg()
    cfg.MODEL.FIRST_STAGE.CORNER_LOSS = True
    cfg.SOLVER.TYPE = "Adam"
    cfg.SOLVER.BASE_LR = 0.003
    model, spec = build_detector(cfg)
    graph = TrainGraph.build(cfg, model, spec)

    rng = np.random.RandomState(3)
    n = 512
    gt = np.zeros((1, 8, 7), np.float32)
    gt[0, 0] = [2.0, 1.5, 10.0, 3.8, 1.6, 1.6, 0.4]
    gt[0, 1] = [-5.0, 1.5, 16.0, 3.8, 1.6, 1.6, -0.9]
    labels = np.zeros((1, 8), np.int32)
    labels[0, :2] = 1

    pts = rng.uniform(-1, 1, (1, n, 4)).astype(np.float32) * np.array(
        [12, 1.5, 12, 1], np.float32
    )
    pts[..., 2] += 13
    # plant dense interior points
    for g in range(2):
        sel = slice(g * 120, (g + 1) * 120)
        pts[0, sel, 0] = gt[0, g, 0] + rng.uniform(-1.5, 1.5, 120)
        pts[0, sel, 1] = gt[0, g, 1] - rng.uniform(0, 1.5, 120)
        pts[0, sel, 2] = gt[0, g, 2] + rng.uniform(-0.7, 0.7, 120)

    batch = {
        "points": jnp.asarray(pts),
        "gt_boxes": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
    }
    state = graph.init_state(jax.random.PRNGKey(0), batch["points"])
    step = jax.jit(graph.train_step)
    key = jax.random.PRNGKey(7)
    first = last = None
    for i in range(150):
        state, metrics = step(state, batch, key)
        if i == 0:
            first = float(metrics["total"])
    last = float(metrics["total"])
    assert last < first * 0.5, (first, last)

    # inference with the trained weights must find the planted boxes
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(variables, batch["points"], False)
    det = spec.decode_and_nms(out)
    boxes = np.asarray(det["boxes"][0])
    scores = np.asarray(det["scores"][0])
    valid = np.asarray(det["valid"][0])
    top = boxes[valid][np.argsort(-scores[valid])][:4]
    _, iou3d = boxes_iou_bev_3d(jnp.asarray(top), jnp.asarray(gt[0, :2]))
    best_per_gt = np.asarray(iou3d).max(axis=0)
    # both planted objects matched reasonably by a top detection
    assert (best_per_gt > 0.3).all(), best_per_gt
