"""End-to-end system proof: run the REAL CLIs over a synthetic on-disk
KITTI tree and record the resulting AP trajectory.

    generate tree -> python -m ssd3d.bin.preprocess (train + val)
                  -> python -m ssd3d.bin.train
                  -> python -m ssd3d.bin.evaluate --once  (every checkpoint)
                  -> AP summary json

This is the closest available stand-in for the 83.30-AP KITTI target
(no KITTI data in this environment) and mirrors the reference's own
integration pattern — the evaluator daemon over a trained checkpoint dir
(lib/core/evaluator.py:94-135).

Usage:
    python tools/e2e_synth.py --workdir /tmp/e2e --iters 2000          # flagship, TPU
    python tools/e2e_synth.py --workdir /tmp/e2e_q --quick             # tiny, CPU-sized
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
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--train_scans", type=int, default=48)
    ap.add_argument("--val_scans", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="tiny config + CPU-sized scans (CI smoke)")
    ap.add_argument("--hard", action="store_true",
                    help="hard-mode multiclass proof: Car/Ped/Cyc scenes "
                    "with occlusion/truncation difficulty spread, "
                    "Van/DontCare distractors and car-like clutter, "
                    "trained with 3dssd_3cls.yaml; AP summary carries all "
                    "nine class x difficulty cells")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--out_json", default=None,
                    help="summary json path (default <workdir>/ap_summary.json)")
    ap.add_argument("--cls_threshold", type=float, default=0.05)
    ap.add_argument("--extra", nargs="*", default=[],
                    help="additional KEY VALUE config overrides")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    data_root = os.path.join(wd, "kitti")
    npz_root = os.path.join(wd, "npz")
    run_dir = os.path.join(wd, "run")

    if args.quick:
        cfg_path = "configs/kitti/3dssd/3dssd_tiny.yaml"
        n_points = 3000
        args.train_scans = min(args.train_scans, 8)
        args.val_scans = min(args.val_scans, 4)
        args.iters = min(args.iters, 600)
        ckpt_interval = max(args.iters // 3, 1)
        args.batch = 2
    elif args.hard:
        cfg_path = "configs/kitti/3dssd/3dssd_3cls.yaml"
        n_points = 20000
        ckpt_interval = max(args.iters // 4, 1)
    else:
        cfg_path = "configs/kitti/3dssd/3dssd.yaml"
        n_points = 20000
        ckpt_interval = max(args.iters // 4, 1)

    env = dict(os.environ)
    if args.cpu or args.quick:
        # child interpreters: no TPU plugin registration, CPU platform
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"

    if not os.path.exists(os.path.join(data_root, "train.txt")):
        from tools.synth_kitti import write_tree

        print(f"generating {args.train_scans}+{args.val_scans} synthetic "
              f"scans under {data_root}", flush=True)
        write_tree(data_root, args.train_scans, args.val_scans, n_points,
                   k_max=8 if args.hard else 5, hard=args.hard)

    opts = [
        "DATASET.KITTI.BASE_DIR_PATH", data_root,
        "DATASET.KITTI.TRAIN_LIST", os.path.join(data_root, "train.txt"),
        "DATASET.KITTI.VAL_LIST", os.path.join(data_root, "val.txt"),
        "DATASET.KITTI.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", str(args.batch),
        "TRAIN.CONFIG.MAX_ITERATIONS", str(args.iters),
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", str(ckpt_interval),
        "TRAIN.AUGMENTATIONS.MIXUP.NUMBER",
        "(5, 4, 4)" if args.hard else "(4, )",
    ] + list(args.extra)
    py = [sys.executable, "-m"]

    if not os.path.exists(os.path.join(npz_root, "train", "list.txt")):
        run(py + ["ssd3d.bin.preprocess", "--cfg", cfg_path,
                  "--img_list", "train"] + opts,
            os.path.join(wd, "preprocess_train.log"), env)
    if not os.path.exists(os.path.join(npz_root, "val", "list.txt")):
        run(py + ["ssd3d.bin.preprocess", "--cfg", cfg_path,
                  "--img_list", "val"] + opts,
            os.path.join(wd, "preprocess_val.log"), env)

    run(py + ["ssd3d.bin.train", "--cfg", cfg_path, "--log_dir", run_dir]
        + opts, os.path.join(wd, "train.log"), env)

    run(py + ["ssd3d.bin.evaluate", "--cfg", cfg_path, "--log_dir", run_dir,
              "--once", "--cls_threshold", str(args.cls_threshold)] + opts,
        os.path.join(wd, "evaluate.log"), env)

    # assemble the AP trajectory from the per-checkpoint eval jsons
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
        "train_scans": args.train_scans,
        "val_scans": args.val_scans,
        "backend": "cpu" if (args.cpu or args.quick) else
                   env.get("JAX_PLATFORMS", "default"),
        "ap_by_step": {
            str(s): (e if args.hard else e.get("Car", {}).get("3d"))
            for s, e in evals.items()
        },
        "best": best,
    }
    if args.hard and evals:
        # AOS regression gate: heading must be LEARNED, not coin-flipped.
        # With 180-symmetric shells AOS pins at ~0.5x image AP (round-3
        # failure); with the asymmetric generator the best-step Car
        # Moderate AOS must track image AP (evaluate.cpp:703-725 protocol).
        best_step = max(
            evals, key=lambda s: evals[s]["Car"]["aos"][1])
        car = evals[best_step]["Car"]
        summary["aos_check"] = {
            "step": best_step,
            "car_moderate_image_ap": car["image"][1],
            "car_moderate_aos": car["aos"][1],
            "aos_to_image_ratio": car["aos"][1] / max(car["image"][1], 1e-6),
            "pass": car["aos"][1] >= car["image"][1] - 5.0,
        }
    out_json = args.out_json or os.path.join(wd, "ap_summary.json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
