"""Continuous-eval daemon / one-shot evaluation (reference lib/core/evaluator.py).

Polls the checkpoint dir, evaluates new checkpoints on the val split, keeps
the best by Car-Moderate-3D AP (or mean Ped/Cyc), and records the best
checkpoint (evaluator.py:94-135). Works for SingleStage and DoubleStage
models via the pipeline dispatcher.

    python -m ssd3d.bin.evaluate --cfg <yaml> --log_dir runs/3dssd \
        [--once] [--cls_threshold 0.3] [--limit N]
"""

import argparse
import json
import os
import shutil
import time

import jax
import jax.numpy as jnp

from ssd3d.config import load_cfg
from ssd3d.data import build_loader
from ssd3d.data.kitti_io import KittiScene
import numpy as np

from ssd3d.eval.predictions import (
    evaluate_recall,
    evaluate_split,
    run_inference_on_split,
)
from ssd3d.models.api import build_pipeline
from ssd3d.train.trainer import CheckpointManager


def evaluate_checkpoint(cfg, pipeline, state, split="val",
                        cls_thresh=0.3, limit=None, log=print,
                        viz_dir=None, viz_scans=0):
    loader = build_loader(cfg, split, training=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if cfg.DATASET.TYPE.upper() == "NUSCENES":
        from ssd3d.eval import nuscenes_predictions as nusc

        det, gt, _ = nusc.run_inference_on_split(
            cfg, pipeline.infer, pipeline.cls_list, variables, loader,
            cls_thresh=cls_thresh, log=log, limit=limit,
            batch_size=cfg.TEST.BATCH_SIZE,
        )
        return nusc.evaluate_split(cfg, det, gt, pipeline.cls_list, log=log)
    scene = KittiScene(cfg.DATASET.KITTI.BASE_DIR_PATH, "training")
    props = []  # stage-1 proposals (two-stage models only)
    det, gt, _ = run_inference_on_split(
        cfg, pipeline.infer, pipeline.cls_list, variables, loader, scene,
        cls_thresh=cls_thresh, log=log, limit=limit,
        batch_size=cfg.TEST.BATCH_SIZE,
        viz_dir=viz_dir, viz_scans=viz_scans, proposals_out=props,
    )
    if cfg.TEST.TEST_MODE == "Recall":
        gt_boxes = [
            np.stack([np.concatenate([g.t, [g.l, g.h, g.w, g.ry]])
                      for g in frame]).astype(np.float32)
            if frame else np.zeros((0, 7), np.float32)
            for frame in gt
        ]
        detected, total, recall = evaluate_recall(det, gt_boxes)
        log(f"recall: {detected}/{total} = {recall:.4f}")
        return {"recall": recall, "detected": detected, "total": total}, recall
    results, selection = evaluate_split(
        cfg, det, gt, pipeline.cls_list, log=log
    )
    if props:
        from ssd3d.eval.predictions import proposal_recall

        # recall only against GTs of the model's classes: the Car-only
        # RPN is not supposed to propose pedestrians/cyclists/vans, and
        # counting them deflates the number ~3x on mixed-class scenes
        wanted = set(pipeline.cls_list)
        gt_boxes = [
            np.stack([np.concatenate([g.t, [g.l, g.h, g.w, g.ry]])
                      for g in frame if g.type in wanted]).astype(np.float32)
            if any(g.type in wanted for g in frame)
            else np.zeros((0, 7), np.float32)
            for frame in gt
        ]
        detected, total, recall = proposal_recall(props, gt_boxes)
        log(f"proposal recall@0.5 ({'/'.join(wanted)}): "
            f"{detected}/{total} = {recall:.4f}")
        results["proposal_recall"] = {
            "iou": 0.5, "detected": detected, "total": total,
            "recall": recall,
        }
    return results, selection


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--cls_threshold", type=float, default=0.3)
    ap.add_argument("--eval_interval_secs", type=int, default=300)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--viz_scans", type=int, default=2,
                    help="per checkpoint, dump 3D scene renders (PNG + "
                    "interactive HTML; points/GT/predictions) for the "
                    "first N val scans under <log_dir>/scene3d_eval/; "
                    "0 disables")
    ap.add_argument("--restore_model_path", default=None,
                    help="evaluate exactly this checkpoint once (run dir, "
                    "ckpt dir, or a single step dir such as best_ckpt) "
                    "instead of polling --log_dir/ckpt — the reference "
                    "evaluator's required flag (evaluator.py:21)")
    ap.add_argument("--restore_tf_checkpoint", default=None,
                    help="evaluate a reference TF-1 checkpoint once "
                    "(name-mapped weight conversion, incl. BN stats)")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    cfg = load_cfg(args.cfg, args.opts)
    os.makedirs(args.log_dir, exist_ok=True)

    pipeline = build_pipeline(cfg)
    shape_loader = build_loader(cfg, args.split, training=False)
    example = jnp.zeros((1, *shape_loader.sample_points_shape), jnp.float32)
    template = pipeline.graph.init_state(jax.random.PRNGKey(0), example)

    if args.restore_tf_checkpoint:
        from ssd3d.utils.tf_checkpoint import convert_tf_checkpoint

        variables = {"params": template.params,
                     "batch_stats": template.batch_stats}
        new_vars, missing = convert_tf_checkpoint(
            args.restore_tf_checkpoint, cfg, variables
        )
        state = template.replace(params=new_vars["params"],
                                 batch_stats=new_vars["batch_stats"])
        print(f"evaluating converted TF checkpoint "
              f"{args.restore_tf_checkpoint} ({len(missing)} unmatched)")
        results, metric = evaluate_checkpoint(
            cfg, pipeline, state, args.split,
            args.cls_threshold, args.limit,
            viz_dir=os.path.join(args.log_dir, "scene3d_eval", "tf_ckpt"),
            viz_scans=args.viz_scans,
        )
        print(f"TF ckpt: selection metric {metric:.2f}")
        with open(os.path.join(args.log_dir, "eval_tf_ckpt.json"), "w") as f:
            json.dump(results, f, indent=1)
        return

    if args.restore_model_path:
        from ssd3d.train.trainer import restore_from_path

        state, step = restore_from_path(args.restore_model_path, template)
        assert state is not None, \
            f"no checkpoint under {args.restore_model_path!r}"
        print(f"evaluating checkpoint {step} from {args.restore_model_path}")
        results, metric = evaluate_checkpoint(
            cfg, pipeline, state, args.split,
            args.cls_threshold, args.limit,
            viz_dir=os.path.join(args.log_dir, "scene3d_eval",
                                 f"ckpt_{step}"),
            viz_scans=args.viz_scans,
        )
        print(f"ckpt {step}: selection metric {metric:.2f}")
        tag = step if step is not None else "restored"
        with open(os.path.join(args.log_dir, f"eval_{tag}.json"), "w") as f:
            json.dump(results, f, indent=1)
        return

    ckpt = CheckpointManager(os.path.join(args.log_dir, "ckpt"))

    best_metric, best_step = -1.0, None
    seen = set()
    while True:
        steps = [s for s in ckpt.all_steps(refresh=True) if s not in seen]
        for step in sorted(steps):
            seen.add(step)
            state, _ = ckpt.restore(template, step)
            print(f"evaluating checkpoint {step}")
            results, metric = evaluate_checkpoint(
                cfg, pipeline, state, args.split,
                args.cls_threshold, args.limit,
                viz_dir=os.path.join(args.log_dir, "scene3d_eval",
                                     f"ckpt_{step}"),
                viz_scans=args.viz_scans,
            )
            print(f"ckpt {step}: selection metric {metric:.2f}")
            with open(os.path.join(args.log_dir, f"eval_{step}.json"), "w") as f:
                json.dump(results, f, indent=1)
            if metric > best_metric:
                best_metric, best_step = metric, step
                with open(os.path.join(args.log_dir, "best.json"), "w") as f:
                    json.dump({"step": step, "metric": metric}, f)
                # copy the best checkpoint aside so max-to-keep GC can't
                # delete it (reference evaluator.py:119-128)
                src = os.path.join(args.log_dir, "ckpt", str(step))
                dst = os.path.join(args.log_dir, "best_ckpt")
                if os.path.isdir(src):
                    shutil.rmtree(dst, ignore_errors=True)
                    shutil.copytree(src, dst)
                print(f"new best: {metric:.2f} @ step {step}")
        if args.once:
            break
        time.sleep(args.eval_interval_secs)


if __name__ == "__main__":
    main()
