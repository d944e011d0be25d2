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

import jax
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
    write_tree(data_root, n_train=6, n_val=3, n_points=2600, seed=3, k_max=3,
               n_test=2)

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
        "DATASET.KITTI.TEST_LIST", os.path.join(data_root, "test.txt"),
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

    # one-shot evaluation of a SPECIFIC checkpoint (the reference
    # evaluator's required --restore_model_path surface), pointed at the
    # copied-aside best_ckpt step dir
    best_step = json.load(open(os.path.join(run_dir, "best.json")))["step"]
    os.remove(os.path.join(run_dir, f"eval_{best_step}.json"))
    _run_cli("ssd3d.bin.evaluate",
             ["--cfg", cfg, "--log_dir", run_dir,
              "--restore_model_path", os.path.join(run_dir, "best_ckpt"),
              "--cls_threshold", "0.01"] + opts, env)
    assert os.path.exists(os.path.join(run_dir, f"eval_{best_step}.json"))

    # KITTI test-server submission path: label-free testing/ split,
    # preprocess --img_list test, then bin.test --split test (no GT read)
    _run_cli("ssd3d.bin.preprocess", ["--cfg", cfg, "--img_list", "test"]
             + opts, env)
    assert os.path.exists(os.path.join(npz_root, "test", "list.txt"))
    _run_cli("ssd3d.bin.test",
             ["--cfg", cfg, "--log_dir", run_dir, "--split", "test",
              "--cls_threshold", "0.01"] + opts, env)
    results = sorted(os.listdir(os.path.join(run_dir, "kitti_result")))
    assert results == ["000000.txt", "000001.txt"]
    for line in open(os.path.join(run_dir, "kitti_result", results[0])):
        assert line.startswith("Car "), line  # KITTI submission row format

    # crash-resume: a fresh bin.train process on the same log_dir restores
    # the latest checkpoint and continues to the new iteration target
    _run_cli("ssd3d.bin.train",
             ["--cfg", cfg, "--log_dir", run_dir, "--max_iterations", "90"]
             + opts, env)
    log = open(os.path.join(run_dir, "log_train.txt")).read()
    assert "restored checkpoint at step 60" in log
    assert os.path.isdir(os.path.join(run_dir, "ckpt", "90"))
    resumed = [json.loads(l)
               for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert resumed[-1]["iter"] == 90  # iteration numbering continued

    # serving export: a self-contained jax.export artifact from the ckpt
    _run_cli("ssd3d.bin.export",
             ["--cfg", cfg, "--log_dir", run_dir, "--batch", "1"] + opts,
             env)
    assert os.path.getsize(os.path.join(run_dir, "detector.jaxexp")) > 1000
    meta = json.load(open(os.path.join(run_dir, "detector.jaxexp.json")))
    assert meta["checkpoint_step"] == 90 and meta["cls_list"] == ["Car"]


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


@pytest.mark.slow
def test_cli_pointrcnn_stagewise(tmp_path):
    """The stage-wise PointRCNN chain on the real CLIs: train stage-1
    (RPN-only), train stage-2 warm-started from it via --restore_model_path
    with the RPN frozen (TRAIN_PARAM_PREFIX), then evaluate the refined
    detector. Asserts the two load-bearing weight-flow facts: stage-2's RPN
    parameters are EXACTLY stage-1's final ones (warm start worked AND the
    freeze held), while the RCNN head moved."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synth_kitti import write_tree

    data_root = str(tmp_path / "kitti")
    npz_root = str(tmp_path / "npz")
    run1 = str(tmp_path / "run_stage1")
    run2 = str(tmp_path / "run_stage2")
    write_tree(data_root, n_train=6, n_val=3, n_points=2600, seed=5, k_max=3)

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child interpreters
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    cfg1 = "configs/kitti/pointrcnn/pointrcnn_tiny_stage1.yaml"
    cfg2 = "configs/kitti/pointrcnn/pointrcnn_tiny_stage2.yaml"
    opts = [
        "DATASET.KITTI.BASE_DIR_PATH", data_root,
        "DATASET.KITTI.TRAIN_LIST", os.path.join(data_root, "train.txt"),
        "DATASET.KITTI.VAL_LIST", os.path.join(data_root, "val.txt"),
        "DATASET.KITTI.SAVE_NUMPY_PATH", npz_root,
        "TRAIN.CONFIG.BATCH_SIZE", "2",
        "TRAIN.CONFIG.MAX_ITERATIONS", "30",
        "TRAIN.CONFIG.CHECKPOINT_INTERVAL", "30",
        "TRAIN.AUGMENTATIONS.MIXUP.NUMBER", "(3, )",
        "TEST.TEST_MODE", "Recall",
    ]

    _run_cli("ssd3d.bin.preprocess", ["--cfg", cfg1, "--img_list", "train"]
             + opts, env)
    _run_cli("ssd3d.bin.preprocess", ["--cfg", cfg1, "--img_list", "val"]
             + opts, env)
    _run_cli("ssd3d.bin.train", ["--cfg", cfg1, "--log_dir", run1] + opts, env)
    _run_cli("ssd3d.bin.train", ["--cfg", cfg2, "--log_dir", run2,
                                 "--restore_model_path", run1] + opts, env)
    log2 = open(os.path.join(run2, "log_train.txt")).read()
    assert "warm start from" in log2

    from ssd3d.train.trainer import CheckpointManager
    raw1, _ = CheckpointManager(os.path.join(run1, "ckpt")).restore_raw()
    raw2, _ = CheckpointManager(os.path.join(run2, "ckpt")).restore_raw()
    leaves1 = jax.tree_util.tree_flatten_with_path(raw1["params"])[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(raw2["params"])[0])
    rpn = [p for p, _ in leaves1 if "rpn" in jax.tree_util.keystr(p)]
    rcnn = [p for p, _ in leaves1 if "rcnn" in jax.tree_util.keystr(p)]
    assert rpn and rcnn
    for p, v1 in leaves1:
        name = jax.tree_util.keystr(p)
        if "rpn" in name:  # warm-started then frozen: bit-identical
            np.testing.assert_array_equal(v1, flat2[p], err_msg=name)
    assert any(
        np.abs(np.asarray(v1) - np.asarray(flat2[p])).max() > 1e-6
        for p, v1 in leaves1 if "rcnn" in jax.tree_util.keystr(p)
    ), "no rcnn parameter moved during stage-2 training"

    _run_cli("ssd3d.bin.evaluate",
             ["--cfg", cfg2, "--log_dir", run2, "--once",
              "--cls_threshold", "0.01"] + opts, env)
    final = json.load(open(os.path.join(run2, "eval_30.json")))
    assert final["total"] > 0 and np.isfinite(final["recall"])

    # STD variant: the same stage-2 recipe but with the PointsPool
    # voxelizing pooler (configs/kitti/std/std_stage2.yaml's pooler row,
    # reference points_pooler.py:64), warm-started from the same stage-1
    # run. Proves the STD chain trains through the real CLI.
    run3 = str(tmp_path / "run_std")
    std_opts = opts + [
        "MODEL.NETWORK.FIRST_STAGE.POINTS_POOLER",
        "['PointsPool', ['mask', 'dist'], [16], 64, 1.0, [4, 4, 4, 4], "
        "[16], True, 'roi_pool']",
    ]
    _run_cli("ssd3d.bin.train", ["--cfg", cfg2, "--log_dir", run3,
                                 "--restore_model_path", run1] + std_opts,
             env)
    metrics = [json.loads(l)
               for l in open(os.path.join(run3, "metrics.jsonl"))]
    assert metrics and all(np.isfinite(m["total"]) for m in metrics)
    raw3, _ = CheckpointManager(os.path.join(run3, "ckpt")).restore_raw()
    flat3 = dict(jax.tree_util.tree_flatten_with_path(raw3["params"])[0])
    # the PointsPool VFE scopes exist and trained under the 'roi' prefix
    assert any("roi_pool" in jax.tree_util.keystr(p) and
               ("vfe" in jax.tree_util.keystr(p) or
                "align" in jax.tree_util.keystr(p)) for p in flat3)
    _run_cli("ssd3d.bin.evaluate",
             ["--cfg", cfg2, "--log_dir", run3, "--once",
              "--cls_threshold", "0.01"] + std_opts, env)
    final = json.load(open(os.path.join(run3, "eval_30.json")))
    assert final["total"] > 0 and np.isfinite(final["recall"])
