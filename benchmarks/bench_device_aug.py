"""Measure the on-device augmentation train step against the host-side
augmentation chain (VERDICT r3 #5): same synthetic tree, same config, N
iterations each with TPU.DEVICE_AUGMENT True/False; records the median
s/it from metrics.jsonl.

The round-3 SAT-collision + coprime-stride rewrite of the device-aug slot
draw was motivated by a measured 4.25 s/it (vs 0.9 host-augmented); this
harness records what the step costs after that fix.

Usage (expects a preprocessed synthetic tree, e.g. from tools/e2e_synth.py):
    python benchmarks/bench_device_aug.py --data /tmp/e2e_r4 --iters 60
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def run_mode(cfg, data_root, npz_root, run_dir, iters, batch, device_aug,
             extra=()):
    opts = [
        "DATASET.KITTI.BASE_DIR_PATH", data_root,
        "DATASET.KITTI.TRAIN_LIST", os.path.join(data_root, "train.txt"),
        "DATASET.KITTI.VAL_LIST", os.path.join(data_root, "val.txt"),
        "DATASET.KITTI.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", str(batch),
        "TRAIN.CONFIG.MAX_ITERATIONS", str(iters),
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", str(iters),
        "TRAIN.CONFIG.SUMMARY_INTERVAL", "10",
        "TPU.DEVICE_AUGMENT", str(device_aug),
    ] + list(extra)
    p = subprocess.run(
        [sys.executable, "-m", "ssd3d.bin.train", "--cfg", cfg,
         "--log_dir", run_dir] + opts,
        capture_output=True, text=True, cwd=REPO,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])
    ms = [json.loads(l)
          for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    # skip the first record (includes compile)
    laps = [m["sec_per_it"] for m in ms[1:]] or [ms[-1]["sec_per_it"]]
    return statistics.median(laps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="workdir holding kitti/ and npz/ (tools/e2e_synth.py layout)")
    ap.add_argument("--cfg", default="configs/kitti/3dssd/3dssd.yaml")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="benchmarks/results_device_aug.json")
    ap.add_argument("--extra", nargs="*", default=[])
    args = ap.parse_args()

    data_root = os.path.join(args.data, "kitti")
    npz_root = os.path.join(args.data, "npz")
    work = os.path.join(args.data, "bench_device_aug")
    host = run_mode(args.cfg, data_root, npz_root,
                    os.path.join(work, "host"), args.iters, args.batch,
                    False, args.extra)
    dev = run_mode(args.cfg, data_root, npz_root,
                   os.path.join(work, "device"), args.iters, args.batch,
                   True, args.extra)
    import jax

    report = {
        "backend": jax.default_backend(),
        "config": args.cfg,
        "batch": args.batch,
        "iters": args.iters,
        "host_aug_sec_per_it": round(host, 3),
        "device_aug_sec_per_it": round(dev, 3),
        "device_over_host": round(dev / host, 3),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
