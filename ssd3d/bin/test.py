"""One-shot inference + prediction dump (reference lib/core/tester.py).

KITTI configs write per-scan result txts; nuScenes configs write one
submission-style JSON (eval/nuscenes_predictions.py).

    python -m ssd3d.bin.test --cfg <yaml> --log_dir runs/3dssd \
        [--split val] [--cls_threshold 0.3]

KITTI test-server submissions (reference tester.py:21,27 `--split test
--no_gt`): preprocess with `--img_list test`, then

    python -m ssd3d.bin.test --cfg <yaml> --log_dir runs/3dssd \
        --split test --no_gt [--restore_model_path runs/3dssd/best_ckpt]
"""

import argparse
import os

import jax
import jax.numpy as jnp

from ssd3d.config import load_cfg
from ssd3d.data import build_loader
from ssd3d.data.kitti_io import KittiScene
from ssd3d.eval.predictions import run_inference_on_split
from ssd3d.models.api import build_pipeline
from ssd3d.train.trainer import CheckpointManager, restore_from_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--cls_threshold", type=float, default=0.3)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--no_gt", action="store_true",
                    help="split has no label files (KITTI test set); "
                    "implied by --split test")
    ap.add_argument("--restore_model_path", default=None,
                    help="checkpoint to load (run dir, ckpt dir, or a "
                    "single step dir such as best_ckpt); defaults to the "
                    "latest under --log_dir/ckpt")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    cfg = load_cfg(args.cfg, args.opts)

    pipeline = build_pipeline(cfg)
    loader = build_loader(cfg, args.split, training=False)
    example = jnp.zeros((1, *loader.sample_points_shape), jnp.float32)
    template = pipeline.graph.init_state(jax.random.PRNGKey(0), example)
    if args.restore_model_path:
        state, step = restore_from_path(args.restore_model_path, template)
    else:
        ckpt = CheckpointManager(os.path.join(args.log_dir, "ckpt"))
        state, step = ckpt.restore(template)
    assert state is not None, f"no checkpoint under {args.log_dir}/ckpt"
    print(f"restored step {step}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if cfg.DATASET.TYPE.upper() == "NUSCENES":
        from ssd3d.eval import nuscenes_predictions as nusc

        save_path = os.path.join(args.log_dir, "nuscenes_result.json")
        nusc.run_inference_on_split(
            cfg, pipeline.infer, pipeline.cls_list, variables, loader,
            cls_thresh=args.cls_threshold, save_path=save_path,
            limit=args.limit, batch_size=cfg.TEST.BATCH_SIZE,
        )
        print(f"predictions saved to {save_path}")
        return

    # the KITTI test set lives under <root>/testing and has no labels
    # (reference tester.py --split/--no_gt)
    scene_split = "testing" if args.split == "test" else "training"
    with_gt = not (args.no_gt or args.split == "test")
    scene = KittiScene(cfg.DATASET.KITTI.BASE_DIR_PATH, scene_split)
    save_dir = os.path.join(args.log_dir, "kitti_result")
    run_inference_on_split(
        cfg, pipeline.infer, pipeline.cls_list, variables, loader, scene,
        cls_thresh=args.cls_threshold, save_dir=save_dir, limit=args.limit,
        with_gt=with_gt, batch_size=cfg.TEST.BATCH_SIZE,
    )
    print(f"predictions saved to {save_dir}")


if __name__ == "__main__":
    main()
