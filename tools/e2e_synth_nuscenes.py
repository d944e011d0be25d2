"""End-to-end nuScenes system proof: run the REAL CLIs over a synthetic
raw nuScenes tree and record the mAP/NDS trajectory.

    generate raw tables + .pcd.bin -> python -m ssd3d.bin.preprocess
    (devkit-free converter) -> python -m ssd3d.bin.train
    -> python -m ssd3d.bin.evaluate --once (every checkpoint) -> summary

The nuScenes twin of tools/e2e_synth.py — the reference's nuScenes path
never ran (SURVEY §2.9), so this chain is the system-level validation of
the rebuilt-from-intent pipeline: sweep aggregation, voxel budget,
velocity/attribute heads and losses, NDS model selection.

Usage:
    python tools/e2e_synth_nuscenes.py --workdir /tmp/e2e_nusc --quick   # CPU
    python tools/e2e_synth_nuscenes.py --workdir /tmp/e2e_nusc --iters 3000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)


def run(cmd, log_path, env=None):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    with open(log_path, "w") as log:
        p = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                           cwd=REPO, env=env)
    dt = time.time() - t0
    if p.returncode != 0:
        tail = open(log_path).read()[-3000:]
        raise RuntimeError(f"{cmd} failed rc={p.returncode}\n{tail}")
    print(f"  done in {dt:.0f}s (log: {log_path})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--scenes", type=int, default=10)
    ap.add_argument("--samples", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="tiny config + CPU-sized clouds (CI smoke)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--k_static", type=int, default=3,
                    help="barrier/traffic-cone instances per scene "
                    "(raise to rebalance hard classes)")
    ap.add_argument("--out_json", default=None)
    ap.add_argument("--cls_threshold", type=float, default=0.05)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional KEY VALUE config overrides")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    raw_root = os.path.join(wd, "raw")
    npz_root = os.path.join(wd, "npz")
    run_dir = os.path.join(wd, "run")

    if args.quick:
        cfg_path = "configs/nuscenes/3dssd/3dssd_tiny.yaml"
        n_points = 2500
        args.scenes = min(args.scenes, 5)
        args.samples = min(args.samples, 4)
        args.iters = min(args.iters, 500)
        ckpt_interval = max(args.iters // 3, 1)
        args.batch = 2
    else:
        cfg_path = "configs/nuscenes/3dssd/3dssd.yaml"
        n_points = 14000
        ckpt_interval = max(args.iters // 4, 1)

    env = dict(os.environ)
    if args.cpu or args.quick:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"

    if not os.path.exists(os.path.join(raw_root, "v1.0-synth")):
        from tools.synth_nuscenes import write_tree

        print(f"generating {args.scenes} synthetic scenes x {args.samples} "
              f"samples under {raw_root}", flush=True)
        write_tree(raw_root, args.scenes, args.samples, n_points,
                   k_static=args.k_static)

    opts = [
        "DATASET.NUSCENES.BASE_DIR_PATH", raw_root,
        "DATASET.NUSCENES.VERSION", "v1.0-synth",
        "DATASET.NUSCENES.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", str(args.batch),
        "TRAIN.CONFIG.MAX_ITERATIONS", str(args.iters),
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", str(ckpt_interval),
    ] + list(args.extra)
    if not args.quick:
        opts += ["DATASET.NUSCENES.CLS_LIST",
                 "('car', 'pedestrian', 'traffic_cone', 'barrier')"]
    py = [sys.executable, "-m"]

    # one preprocess call converts every scene and writes both split lists
    if not os.path.exists(os.path.join(npz_root, "val", "list.txt")):
        run(py + ["ssd3d.bin.preprocess", "--cfg", cfg_path,
                  "--img_list", "train"] + opts,
            os.path.join(wd, "preprocess.log"), env)

    run(py + ["ssd3d.bin.train", "--cfg", cfg_path, "--log_dir", run_dir]
        + opts, os.path.join(wd, "train.log"), env)

    run(py + ["ssd3d.bin.evaluate", "--cfg", cfg_path, "--log_dir", run_dir,
              "--once", "--cls_threshold", str(args.cls_threshold)] + opts,
        os.path.join(wd, "evaluate.log"), env)

    evals = {}
    for f in sorted(os.listdir(run_dir)):
        if f.startswith("eval_") and f.endswith(".json"):
            step = int(f[5:-5])
            evals[step] = json.load(open(os.path.join(run_dir, f)))
    best = None
    best_path = os.path.join(run_dir, "best.json")
    if os.path.exists(best_path):
        best = json.load(open(best_path))
    summary = {
        "config": cfg_path,
        "iters": args.iters,
        "scenes": args.scenes,
        "samples_per_scene": args.samples,
        "backend": "cpu" if (args.cpu or args.quick) else
                   env.get("JAX_PLATFORMS", "default"),
        "by_step": {
            str(s): {"mAP": e.get("mAP"), "NDS": e.get("NDS")}
            for s, e in evals.items()
        },
        "final_per_class": (
            evals[max(evals)].get("per_class") if evals else None
        ),
        "best": best,
    }
    out_json = args.out_json or os.path.join(wd, "nds_summary.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
