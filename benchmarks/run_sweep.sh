#!/bin/bash
# Refresh every measured artifact in one pass (run on the TPU terminal).
# Each step rewrites its committed JSON; README numbers cite these files.
#
#   bash benchmarks/run_sweep.sh [e2e_workdir_for_device_aug]
#
# NOTE: the remote compile helper is single-threaded — run this with the
# chip otherwise idle; each uncached step-compile holds the tunnel for
# minutes.
set -e
cd "$(dirname "$0")/.."

echo "== bench.py (headline) =="
python bench.py 8 | tail -1 | tee /tmp/bench_headline.json

echo "== per-config sweep (scans/s + mfu per row) =="
python benchmarks/bench_configs.py benchmarks/results_configs.json

echo "== flagship step breakdown (batch 8) =="
python tools/profile_step.py --batch 8 --out benchmarks/profile_breakdown.json

echo "== transport round-trip floor =="
python tools/rtt_probe.py | tee benchmarks/rtt_floor.json

echo "== batch-1 breakdown =="
python tools/profile_step.py --batch 1 --out benchmarks/profile_batch1.json

echo "== nuScenes 10-class breakdown (NMS share) =="
python tools/profile_step.py --cfg configs/nuscenes/3dssd/3dssd.yaml \
  --infer_only --batch 1 --points 65536 \
  --out benchmarks/profile_nuscenes.json

echo "== two-stage breakdown =="
python tools/profile_two_stage.py --out benchmarks/profile_two_stage.json

if [ -n "$1" ]; then
  echo "== device-aug vs host-aug train step =="
  python benchmarks/bench_device_aug.py --data "$1" \
    --out benchmarks/results_device_aug.json
fi

echo "sweep done; diff the benchmarks/*.json against README claims"
