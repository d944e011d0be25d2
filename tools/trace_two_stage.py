"""Device trace of the fused two-stage inference graph.

profile_two_stage.py gives the stage-boundary wall breakdown; this gives the
HLO-level device truth for the SAME fused jit the bench rows time — which op
family (ball query ring-words, FP three_nn/interpolate gathers, pooled
gathers, NMS sweeps, conv fusions) actually holds the two-stage step, so
optimization effort lands where the time is (reference chain:
double_stage_detector.py:166-219).

Usage:
    python tools/trace_two_stage.py [--cfg configs/kitti/pointrcnn/pointrcnn_test.yaml]
        [--batch 2] [--points 16384] [--out benchmarks/trace_two_stage.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from tools.profile_step import _scene_batch  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="configs/kitti/pointrcnn/pointrcnn_test.yaml")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--trace_dir", default="/tmp/ssd3d_trace_2s")
    ap.add_argument("--out", default="benchmarks/trace_two_stage.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssd3d.config import load_cfg
    from ssd3d.models.api import build_pipeline
    from ssd3d.utils import profiling

    cfg = load_cfg(args.cfg, [])
    pipeline = build_pipeline(cfg)

    pts, _, _ = _scene_batch(args.batch, args.points)
    x = jnp.asarray(pts)
    state = pipeline.graph.init_state(jax.random.PRNGKey(0), x[:1])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    infer = jax.jit(pipeline.infer)

    # compile + settle (fresh inputs each call: the relay dedupes repeats)
    float(np.asarray(infer(variables, x)["scores"]).ravel()[0])
    float(np.asarray(infer(variables, x + jnp.float32(1e-3))["scores"]).ravel()[0])

    report = {
        "backend": jax.default_backend(),
        "config": args.cfg,
        "batch": args.batch,
        "points": args.points,
    }
    os.makedirs(args.trace_dir, exist_ok=True)
    try:
        with profiling.trace(args.trace_dir):
            for i in range(4):
                out = infer(variables, x + jnp.float32((i + 2) * 1e-3))
                float(np.asarray(out["scores"]).ravel()[0])
        by_cat = profiling.summarize_trace(args.trace_dir, top=15,
                                           by_category=True)
        by_op = profiling.summarize_trace(args.trace_dir, top=30)
        report["trace_executions"] = 4
        report["trace_by_category_ms"] = [[k, round(v, 2)] for k, v in by_cat]
        report["trace_top_ops_ms"] = [[k, round(v, 2)] for k, v in by_op]
    except Exception as e:
        report["trace_error"] = f"{type(e).__name__}: {e}"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
