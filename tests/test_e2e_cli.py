"""CI-sized end-to-end CLI test: the REAL command-line entry points
(bin.preprocess -> bin.train -> bin.evaluate) over a synthetic on-disk
KITTI tree, exactly as a user would run them. The assembled-system check the
reference only had as a manually-run daemon loop (evaluator.py:94-135).

Model quality at this scale is covered by test_e2e.py's overfit test; this
test asserts the SYSTEM: every CLI exits 0, the expected artifacts appear
(npz split + mixup DB + checkpoints + metrics + per-checkpoint evals), and
the trained model localizes at recall level (3D IoU 0.25 on easy scenes).
The full AP trajectory proof is tools/e2e_synth.py (run per round, writes
AP_r{N}.json)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _run_cli(module, argv, env):
    p = subprocess.run(
        [sys.executable, "-m", module] + argv,
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500,
    )
    assert p.returncode == 0, (
        f"{module} failed rc={p.returncode}\n--- stdout tail\n"
        f"{p.stdout[-1500:]}\n--- stderr tail\n{p.stderr[-1500:]}"
    )
    return p


@pytest.mark.slow
def test_cli_preprocess_train_evaluate(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synth_kitti import write_tree

    data_root = str(tmp_path / "kitti")
    npz_root = str(tmp_path / "npz")
    run_dir = str(tmp_path / "run")
    write_tree(data_root, n_train=6, n_val=3, n_points=2600, seed=3, k_max=3)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child interpreters
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    cfg = "configs/kitti/3dssd/3dssd_tiny.yaml"
    opts = [
        "DATASET.KITTI.BASE_DIR_PATH", data_root,
        "DATASET.KITTI.TRAIN_LIST", os.path.join(data_root, "train.txt"),
        "DATASET.KITTI.VAL_LIST", os.path.join(data_root, "val.txt"),
        "DATASET.KITTI.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", "2",
        "TRAIN.CONFIG.MAX_ITERATIONS", "60",
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", "30",
        "TRAIN.AUGMENTATIONS.MIXUP.NUMBER", "(3, )",
        "TEST.TEST_MODE", "Recall",
    ]

    _run_cli("ssd3d.bin.preprocess", ["--cfg", cfg, "--img_list", "train"] + opts, env)
    _run_cli("ssd3d.bin.preprocess", ["--cfg", cfg, "--img_list", "val"] + opts, env)
    assert os.path.exists(os.path.join(npz_root, "train", "list.txt"))
    assert os.path.exists(os.path.join(npz_root, "val", "list.txt"))
    assert os.path.exists(os.path.join(
        npz_root, "mixup_database", "KITTI", "train", "Car", "list.txt"))

    _run_cli("ssd3d.bin.train", ["--cfg", cfg, "--log_dir", run_dir] + opts, env)
    assert os.path.isdir(os.path.join(run_dir, "ckpt"))
    metrics = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert metrics and all(np.isfinite(m["total"]) for m in metrics)
    # training made progress (first vs last summary window)
    assert metrics[-1]["total"] < metrics[0]["total"]

    _run_cli("ssd3d.bin.evaluate",
             ["--cfg", cfg, "--log_dir", run_dir, "--once",
              "--cls_threshold", "0.01"] + opts, env)
    evals = sorted(f for f in os.listdir(run_dir) if f.startswith("eval_"))
    assert evals == ["eval_30.json", "eval_60.json"]
    final = json.load(open(os.path.join(run_dir, "eval_60.json")))
    assert final["total"] > 0  # GT present on the val split
    assert np.isfinite(final["recall"])
    assert os.path.exists(os.path.join(run_dir, "best.json"))


@pytest.mark.slow
def test_cli_nuscenes_preprocess_train_evaluate(tmp_path):
    """The nuScenes CLI chain: raw-table conversion via bin.preprocess
    (devkit-free), training with velocity/attribute losses, NDS-selected
    evaluation — the system-level check of the rebuilt nuScenes path (the
    reference's never ran, SURVEY §2.9)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synth_nuscenes import write_tree

    raw_root = str(tmp_path / "raw")
    npz_root = str(tmp_path / "npz")
    run_dir = str(tmp_path / "run")
    write_tree(raw_root, n_scenes=5, samples_per_scene=3, n_points=2200,
               seed=1)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child interpreters
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    cfg = "configs/nuscenes/3dssd/3dssd_tiny.yaml"
    opts = [
        "DATASET.NUSCENES.BASE_DIR_PATH", raw_root,
        "DATASET.NUSCENES.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", "2",
        "TRAIN.CONFIG.MAX_ITERATIONS", "40",
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", "40",
    ]

    _run_cli("ssd3d.bin.preprocess", ["--cfg", cfg, "--img_list", "train"]
             + opts, env)
    # one conversion pass writes both splits (scene 1 -> val by the
    # every-5th rule)
    assert os.path.exists(os.path.join(npz_root, "train", "list.txt"))
    assert os.path.exists(os.path.join(npz_root, "val", "list.txt"))

    _run_cli("ssd3d.bin.train", ["--cfg", cfg, "--log_dir", run_dir] + opts,
             env)
    metrics = [json.loads(l)
               for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert metrics and all(np.isfinite(m["total"]) for m in metrics)
    # the nuScenes-only loss terms are live
    assert {"velocity", "attribute"} <= set(metrics[0])

    _run_cli("ssd3d.bin.evaluate",
             ["--cfg", cfg, "--log_dir", run_dir, "--once",
              "--cls_threshold", "0.01"] + opts, env)
    final = json.load(open(os.path.join(run_dir, "eval_40.json")))
    assert np.isfinite(final["NDS"]) and np.isfinite(final["mAP"])
    assert set(final["per_class"]) == {"car", "pedestrian", "traffic_cone",
                                       "barrier"}
    assert os.path.exists(os.path.join(run_dir, "best.json"))

    # tester: submission-style JSON dump
    _run_cli("ssd3d.bin.test",
             ["--cfg", cfg, "--log_dir", run_dir, "--cls_threshold", "0.01"]
             + opts, env)
    dump = json.load(open(os.path.join(run_dir, "nuscenes_result.json")))
    assert dump["results"], "empty submission dump"
    rec = next(iter(dump["results"].values()))
    if rec:
        assert {"translation_cam", "detection_name", "detection_score",
                "velocity_cam", "attribute_id"} <= set(rec[0])
