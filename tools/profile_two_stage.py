"""Two-stage (PointRCNN/STD) step-time breakdown.

Splits the inference pipeline at its stage boundaries (the reference's
forward chain, double_stage_detector.py:166-219):

    rpn_forward   - SA/FP backbone + RPN head
    propose_nms   - decode + class-unaware proposal NMS (postprocessor.py:24)
    pool          - RoI pooling alone (query_boxes_3d_points + group + align)
    rcnn          - pooling + RCNN SA stack + refinement head
    final_nms     - stage-2 decode + per-class NMS
    infer_total   - the fused end-to-end jit (stages overlap under XLA)

Each stage is jitted separately and timed with fresh inputs + a scalar
fetch (Stopwatch discipline; see tools/profile_step.py). Writes
benchmarks/profile_two_stage.json.

Usage:
    python tools/profile_two_stage.py [--cfg configs/kitti/pointrcnn/pointrcnn_test.yaml]
        [--batch 2] [--points 16384] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tools.profile_step import _scene_batch, _timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="configs/kitti/pointrcnn/pointrcnn_test.yaml")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="benchmarks/profile_two_stage.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssd3d.config import load_cfg
    from ssd3d.models.api import build_pipeline
    from ssd3d.models.two_stage import build_two_stage

    cfg = load_cfg(args.cfg, [])
    pipeline = build_pipeline(cfg)
    model, rpn_spec, rcnn_spec = build_two_stage(cfg, nms_pre_topk=2048)

    pts, _, _ = _scene_batch(args.batch, args.points)
    x = jnp.asarray(pts)
    # specs are static python objects — keep init unjitted so they don't
    # get treated as traced arguments
    variables = model.init(
        jax.random.PRNGKey(0), x[:1], False,
        rpn_spec=rpn_spec, rcnn_spec=rcnn_spec,
    )

    def jitter(i):
        return x + jnp.float32(i) * 1e-3

    rpn = jax.jit(lambda v, p: model.apply(v, p, False, 0.9, method="rpn"))
    rpn_out = rpn(variables, x)
    propose = jax.jit(lambda o: rpn_spec.propose(o))
    proposals, p_scores, p_valid = propose(rpn_out)
    base_mask = jax.jit(
        lambda o: (jax.nn.sigmoid(jnp.max(o["cls"], -1, keepdims=True))
                   >= 0.5).astype(jnp.float32)
    )(rpn_out)

    pool = jax.jit(lambda v, xyz, feat, m, prop: model.apply(
        v, xyz, feat, m, prop, False, 0.9,
        method=lambda mod, *a: mod.pooler(*a),
    ))
    rcnn = jax.jit(lambda v, xyz, feat, m, prop: model.apply(
        v, xyz, feat, m, prop, False, 0.9, method="rcnn"
    ))
    rcnn_out = rcnn(variables, rpn_out["base_xyz"], rpn_out["feature"],
                    base_mask, proposals)
    # stage-2 decode anchors on the proposals (two_stage.py decode)
    rcnn_out = {**rcnn_out, "proposals": proposals,
                "proposal_scores": p_scores, "proposal_valid": p_valid}
    final = jax.jit(lambda o: rcnn_spec.final_detections(o))
    infer = jax.jit(pipeline.infer)

    def tree_jitter(tree, i):
        return jax.tree.map(lambda a: a + jnp.asarray(i, a.dtype) * 0, tree)

    stages = {}
    stages["rpn_forward_ms"] = _timeit(
        rpn, lambda i: (variables, jitter(i)), args.iters) * 1e3
    stages["propose_nms_ms"] = _timeit(
        propose, lambda i: (tree_jitter(rpn_out, i),), args.iters) * 1e3
    stages["pool_ms"] = _timeit(
        pool, lambda i: (variables, rpn_out["base_xyz"] + i * 1e-4,
                         rpn_out["feature"], base_mask, proposals),
        args.iters) * 1e3
    stages["rcnn_ms"] = _timeit(
        rcnn, lambda i: (variables, rpn_out["base_xyz"] + i * 1e-4,
                         rpn_out["feature"], base_mask, proposals),
        args.iters) * 1e3
    stages["final_nms_ms"] = _timeit(
        final, lambda i: (tree_jitter(rcnn_out, i),), args.iters) * 1e3
    total_s = _timeit(infer, lambda i: (variables, jitter(i)), args.iters)
    stages["infer_total_ms"] = total_s * 1e3

    report = {
        "backend": jax.default_backend(),
        "batch": args.batch,
        "points": args.points,
        "config": args.cfg,
        "rcnn_infer_chunk": cfg.TEST.RCNN_INFER_CHUNK,
        "proposals": int(proposals.shape[1]),
        "staged_ms": {k: round(v, 2) for k, v in stages.items()},
        "scans_per_sec": round(args.batch / total_s, 2),
        "note": (
            "pool_ms is the pooler jitted in ISOLATION and is not "
            "representative - XLA loses the fusion plan it builds inside "
            "the full rcnn graph (rcnn_ms INCLUDES the same pooling); "
            "read rpn/rcnn/infer_total as the stage story. Wall numbers "
            "include the ~26.6 ms transport floor (rtt_floor.json)."
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
