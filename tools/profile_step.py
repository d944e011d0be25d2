"""Publish the train/inference step time breakdown (VERDICT r1 #5b).

Two complementary views, both written to benchmarks/profile_breakdown.json:

1. `jax.profiler` device trace, aggregated by HLO category and by op
   (ssd3d.utils.profiling.summarize_trace). On backends whose runtime
   can't serve device traces (the axon tunnel), this section degrades to
   whatever the trace contains and the staged view below is authoritative.
2. Staged wall-clock: each pipeline stage jitted separately and timed with
   fresh inputs + a scalar fetch per iteration (Stopwatch discipline —
   block_until_ready alone under-reports through remote tunnels). Stages:
     infer: raw network forward | decode+NMS | whole pipeline
     train: loss forward | full value_and_grad step | whole train step
   The staged sum exceeds the fused whole-graph time (XLA overlaps
   stages when compiled together); the per-stage shares are the signal.

Usage:
    python tools/profile_step.py [--batch 8] [--points 16384] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def _scene_batch(batch, n_points, n_feat=4, seed=0):
    from tools.synth_kitti import make_scene

    rng = np.random.default_rng(seed)
    pts = np.zeros((batch, n_points, n_feat), np.float32)
    boxes = np.zeros((batch, 64, 7), np.float32)
    labels = np.zeros((batch, 64), np.int32)
    for b in range(batch):
        scan, gts = make_scene(rng, n_points=n_points + 2048, k_max=6)
        sel = rng.choice(len(scan), n_points, replace=len(scan) < n_points)
        pts[b, :, :4] = scan[sel]
        k = min(len(gts), 64)
        if k:
            boxes[b, :k] = np.asarray(gts)[:k, :7]
            labels[b, :k] = 1
    return pts, boxes, labels


def _timeit(fn, make_args, iters, warmup=2):
    import jax

    for i in range(warmup):
        out = fn(*make_args(i))
        jax.tree.map(lambda x: x.block_until_ready(), out)
    laps = []
    for i in range(iters):
        args = make_args(i + warmup)
        t0 = time.perf_counter()
        out = fn(*args)
        # force completion by fetching a scalar (async/relay-correct)
        leaf = jax.tree.leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        laps.append(time.perf_counter() - t0)
    return float(np.median(laps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/kitti/3dssd/3dssd.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="benchmarks/profile_breakdown.json")
    ap.add_argument("--trace_dir", default="/tmp/ssd3d_trace")
    ap.add_argument("--infer_only", action="store_true",
                    help="skip the train-step stages (e.g. nuScenes, whose "
                    "train batch needs velocity/attribute labels this "
                    "synthetic feeder doesn't build)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssd3d.config import load_cfg
    from ssd3d.models.api import build_pipeline
    from ssd3d.utils import profiling

    cfg = load_cfg(args.cfg, [])
    pipeline = build_pipeline(cfg)
    model, graph = pipeline.model, pipeline.graph
    spec = graph.spec

    n_feat = 5 if cfg.DATASET.TYPE.upper() == "NUSCENES" else 4
    pts, boxes, labels = _scene_batch(args.batch, args.points, n_feat=n_feat)
    x = jnp.asarray(pts)
    state = graph.init_state(jax.random.PRNGKey(0), x[:1])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = {
        "points": x,
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.asarray(labels),
    }
    rng = jax.random.PRNGKey(1)

    def jitter(i):
        return x + jnp.float32(i) * 1e-3

    report = {
        "backend": jax.default_backend(),
        "batch": args.batch,
        "points": args.points,
        "config": args.cfg,
    }

    # ---- staged wall-clock ------------------------------------------------
    fwd = jax.jit(lambda v, p: model.apply(v, p, False))
    full = jax.jit(pipeline.infer)
    raw_out = fwd(variables, x)
    decode = jax.jit(lambda o: spec.decode_and_nms(o))

    stages = {}
    stages["infer_forward_ms"] = _timeit(
        fwd, lambda i: (variables, jitter(i)), args.iters) * 1e3
    stages["infer_decode_nms_ms"] = _timeit(
        decode,
        lambda i: (jax.tree.map(lambda a: a + jnp.asarray(i, a.dtype) * 0,
                                raw_out),),
        args.iters) * 1e3

    # NMS alone (the per-class O(K²) sweep, no box decode/scores): the
    # nuScenes 10-class share question (VERDICT r3) needs this split out
    from ssd3d.core.geometry import boxes_to_bev_aabb
    from ssd3d.ops.nms import batched_class_nms

    @jax.jit
    def nms_inputs(o):
        anchors = spec.anchors(o["base_xyz"])
        bxs = spec.coder.decode(o["base_xyz"], o["offset"], o["angle_cls"],
                                o["angle_res"], anchors)
        sc = (jax.nn.softmax(o["cls"], axis=-1)[..., 1:]
              if spec.cls_activation == "Softmax"
              else jax.nn.sigmoid(o["cls"]))
        return bxs, boxes_to_bev_aabb(bxs), sc

    bxs, bev, sc = jax.tree.map(
        lambda a: a.block_until_ready(), nms_inputs(raw_out))
    nms_only = jax.jit(lambda b3, bv, s: batched_class_nms(
        b3, bv, s, spec.max_output, spec.nms_threshold))
    stages["nms_only_ms"] = _timeit(
        nms_only,
        lambda i: (bxs, bev, sc + jnp.float32(i) * 1e-6),
        args.iters) * 1e3
    stages["infer_total_ms"] = _timeit(
        full, lambda i: (variables, jitter(i)), args.iters) * 1e3

    def batch_i(i):
        return {**batch, "points": jitter(i)}

    if not args.infer_only:
        loss_fwd = jax.jit(
            lambda p, bs, b, r: graph.compute_losses(p, bs, b, r, 0.9)[0]
        )
        step = jax.jit(graph.train_step)

        stages["train_loss_forward_ms"] = _timeit(
            loss_fwd,
            lambda i: (state.params, state.batch_stats, batch_i(i),
                       jax.random.fold_in(rng, i)),
            args.iters) * 1e3
        stages["train_step_total_ms"] = _timeit(
            step,
            lambda i: (state, batch_i(i), jax.random.fold_in(rng, i)),
            args.iters) * 1e3
    report["staged_ms"] = {k: round(v, 2) for k, v in stages.items()}

    # ---- device trace -----------------------------------------------------
    try:
        os.makedirs(args.trace_dir, exist_ok=True)
        with profiling.trace(args.trace_dir):
            for i in range(3):
                out = full(variables, jitter(100 + i))
                float(np.asarray(out["scores"]).ravel()[0])
            if not args.infer_only:
                for i in range(3):
                    out = step(state, batch_i(100 + i),
                               jax.random.fold_in(rng, 100 + i))
                    float(np.asarray(out[1]["total"]))
        by_cat = profiling.summarize_trace(args.trace_dir, top=15,
                                           by_category=True)
        by_op = profiling.summarize_trace(args.trace_dir, top=25)
        report["trace_by_category_ms"] = [
            [k, round(v, 2)] for k, v in by_cat
        ]
        report["trace_top_ops_ms"] = [[k, round(v, 2)] for k, v in by_op]
    except Exception as e:  # trace unsupported through the tunnel
        report["trace_error"] = f"{type(e).__name__}: {e}"

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
