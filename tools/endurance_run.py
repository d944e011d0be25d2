"""Full-schedule endurance proof: the training SYSTEM under a real
schedule, not a 3k-iteration smoke.

One run exercises, as a system, everything the reference's recipe demands
(configs/kitti/3dssd/3dssd.yaml:20-29, lib/core/trainer.py:177-207,
lib/core/evaluator.py:94-135):

  - a long schedule whose LR decay boundary is actually crossed
    (SOLVER.STEPS decay inside the run, verified from the logged lr),
  - checkpoint rotation PAST max_to_keep=10 (oldest checkpoints pruned;
    verified from the surviving step dirs),
  - a deliberate mid-run SIGKILL + restart: the trainer resumes from the
    latest checkpoint and — because the loader fast-forwards its pure
    (epoch, index) stream to the restored step (loader.batches
    start_iter) — re-executes the SAME batches the killed run saw, so
    the overlapping logged window (kill happens ~600 iters after the
    checkpoint) must reproduce the pre-kill trajectory,
  - the evaluator DAEMON polling the live run concurrently (not --once
    after the fact): per-checkpoint evals, skip-seen behavior, and
    best-checkpoint promotion across rotated saves (best_ckpt copy
    survives max-to-keep GC).

Artifact: ENDURANCE json with the lr/loss curve, the decay-boundary
crossing, the kill/resume window comparison, the surviving checkpoint
set, and the daemon's eval trajectory + promotion.

Usage:
    python tools/endurance_run.py --workdir /tmp/endure --iters 20000
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

from tools.e2e_synth import run  # noqa: E402


def read_metrics(path):
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--decay_at", type=int, default=16000)
    ap.add_argument("--kill_after_ckpt", type=int, default=9000)
    ap.add_argument("--kill_overlap", type=int, default=600,
                    help="iters past the kill checkpoint before SIGKILL - "
                    "this window is logged by BOTH runs and compared")
    ap.add_argument("--ckpt_interval", type=int, default=1500)
    ap.add_argument("--train_scans", type=int, default=256)
    ap.add_argument("--val_scans", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out_json", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="driver smoke on CPU: tiny config, tiny schedule")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    data_root = os.path.join(wd, "kitti")
    npz_root = os.path.join(wd, "npz")
    run_dir = os.path.join(wd, "run")
    cfg_path = "configs/kitti/3dssd/3dssd.yaml"
    n_points = 20000
    env = dict(os.environ)
    if args.quick:
        cfg_path = "configs/kitti/3dssd/3dssd_tiny.yaml"
        n_points = 3000
        args.iters, args.decay_at, args.ckpt_interval = 120, 90, 10
        args.kill_after_ckpt, args.kill_overlap = 50, 20
        args.train_scans, args.val_scans, args.batch = 8, 4, 2
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"

    if not os.path.exists(os.path.join(data_root, "train.txt")):
        from tools.synth_kitti import write_tree

        print(f"generating {args.train_scans}+{args.val_scans} synthetic "
              f"scans under {data_root}", flush=True)
        write_tree(data_root, args.train_scans, args.val_scans, n_points,
                   k_max=5)

    opts = [
        "DATASET.KITTI.BASE_DIR_PATH", data_root,
        "DATASET.KITTI.TRAIN_LIST", os.path.join(data_root, "train.txt"),
        "DATASET.KITTI.VAL_LIST", os.path.join(data_root, "val.txt"),
        "DATASET.KITTI.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", str(args.batch),
        "TRAIN.CONFIG.MAX_ITERATIONS", str(args.iters),
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", str(args.ckpt_interval),
        "TRAIN.CONFIG.SUMMARY_INTERVAL", "5" if args.quick else "50",
        "SOLVER.STEPS", f"[{args.decay_at}]",
        "TRAIN.AUGMENTATIONS.MIXUP.NUMBER", "(6, )",
    ]
    py = [sys.executable, "-m"]

    for split in ("train", "val"):
        if not os.path.exists(os.path.join(npz_root, split, "list.txt")):
            run(py + ["ssd3d.bin.preprocess", "--cfg", cfg_path,
                      "--img_list", split] + opts,
                os.path.join(wd, f"preprocess_{split}.log"), env)

    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    train_cmd = py + ["ssd3d.bin.train", "--cfg", cfg_path,
                      "--log_dir", run_dir] + opts
    eval_cmd = py + ["ssd3d.bin.evaluate", "--cfg", cfg_path,
                     "--log_dir", run_dir, "--eval_interval_secs", "60",
                     "--cls_threshold", "0.05"] + opts

    def popen(cmd, log_name):
        log = open(os.path.join(wd, log_name), "a")
        return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                cwd=REPO, env=env)

    print("+ trainer (run 1) + evaluator daemon", flush=True)
    trainer = popen(train_cmd, "train_run1.log")
    daemon = popen(eval_cmd, "eval_daemon.log")

    # ---- wait for the kill point: ckpt saved AND overlap window logged
    kill_at = args.kill_after_ckpt + args.kill_overlap
    killed_at = None
    while True:
        if trainer.poll() is not None:
            raise RuntimeError(
                f"trainer exited rc={trainer.returncode} before the kill "
                f"point; see train_run1.log")
        rows = read_metrics(metrics_path)
        last = rows[-1]["iter"] if rows else 0
        ckpt_there = os.path.isdir(
            os.path.join(run_dir, "ckpt", str(args.kill_after_ckpt)))
        if ckpt_there and last >= kill_at:
            killed_at = last
            print(f"SIGKILL trainer at logged iter {last} "
                  f"(ckpt {args.kill_after_ckpt} on disk)", flush=True)
            trainer.send_signal(signal.SIGKILL)
            trainer.wait()
            break
        time.sleep(10)

    rows_run1 = read_metrics(metrics_path)

    print("+ trainer (run 2: resume)", flush=True)
    trainer = popen(train_cmd, "train_run2.log")
    rc = trainer.wait()
    if rc != 0:
        raise RuntimeError(f"resumed trainer failed rc={rc}")

    # ---- let the daemon catch up on the last checkpoint (the trainer
    # saves a final post-loop checkpoint at max_iters), then stop it
    last_ckpt = args.iters
    deadline = time.time() + 1800
    while time.time() < deadline:
        if os.path.exists(os.path.join(run_dir, f"eval_{last_ckpt}.json")):
            break
        if daemon.poll() is not None:
            break
        time.sleep(15)
    daemon.send_signal(signal.SIGTERM)
    try:
        daemon.wait(timeout=60)
    except subprocess.TimeoutExpired:
        daemon.kill()

    # ---- assemble the artifact
    rows = read_metrics(metrics_path)
    # run-2 rows are appended after run-1's: the iter sequence decreases at
    # the seam (run-1 may have flushed rows after our pre-kill snapshot, so
    # detect the seam from the data, falling back to the snapshot length)
    seam = len(rows_run1)
    for i in range(1, len(rows)):
        if rows[i]["iter"] <= rows[i - 1]["iter"]:
            seam = i
            break
    run1 = {r["iter"]: r for r in rows[:seam]}
    run2 = {r["iter"]: r for r in rows[seam:]}
    overlap = sorted(set(run1) & set(run2))
    resume_check = {
        "killed_at_iter": killed_at,
        "resumed_from": args.kill_after_ckpt,
        "overlap_iters": overlap,
        "max_abs_total_diff": max(
            (abs(run1[i]["total"] - run2[i]["total"]) for i in overlap),
            default=None),
        "pairs": [
            [i, run1[i]["total"], run2[i]["total"]] for i in overlap
        ],
    }

    lr_curve = [[r["iter"], r["lr"]] for r in rows[seam:]]
    before = [lr for it, lr in lr_curve
              if args.decay_at - 200 <= it < args.decay_at]
    after = [lr for it, lr in lr_curve
             if args.decay_at < it <= args.decay_at + 200]
    decay_check = {
        "boundary": args.decay_at,
        "lr_before": before[-1] if before else None,
        "lr_after": after[0] if after else None,
        "ratio": (after[0] / before[-1]) if before and after else None,
    }

    ckpt_dir = os.path.join(run_dir, "ckpt")
    kept = sorted(
        int(d) for d in os.listdir(ckpt_dir) if d.isdigit()
    ) if os.path.isdir(ckpt_dir) else []
    evals = {}
    for f in sorted(os.listdir(run_dir)):
        if f.startswith("eval_") and f.endswith(".json"):
            evals[int(f[5:-5])] = json.load(
                open(os.path.join(run_dir, f)))
    best = None
    if os.path.exists(os.path.join(run_dir, "best.json")):
        best = json.load(open(os.path.join(run_dir, "best.json")))

    loss_curve = [[r["iter"], round(r["total"], 4)] for r in rows
                  if r["iter"] % 500 == 0]
    summary = {
        "config": cfg_path,
        "iters": args.iters,
        "train_scans": args.train_scans,
        "batch": args.batch,
        "sec_per_it_median": sorted(
            r["sec_per_it"] for r in rows[seam:])[len(rows[seam:]) // 2]
        if rows[seam:] else None,
        "resume_check": resume_check,
        "decay_check": decay_check,
        "checkpoints_kept": kept,
        "max_to_keep_respected": len(kept) <= 10,
        "total_checkpoints_written": args.iters // args.ckpt_interval + 1,
        "eval_daemon": {
            "evaluated_steps": sorted(evals),
            "car_mod_3d_by_step": {
                str(s): e.get("Car", {}).get("3d", [None, None, None])[1]
                for s, e in evals.items()
            },
            "best": best,
            "best_ckpt_preserved": os.path.isdir(
                os.path.join(run_dir, "best_ckpt")),
        },
        "loss_curve_every500": loss_curve,
    }
    out = args.out_json or os.path.join(wd, "endurance.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "loss_curve_every500"}, indent=1))


if __name__ == "__main__":
    main()
