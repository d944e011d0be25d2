"""Multi-host training simulation: two coordinated processes (4 virtual CPU
devices each) train over one global 8-device mesh and must produce the
SAME first-step losses as a single process with 8 devices — the
global-batch math (batch assembly, grad psum, SyncBN statistics) is
topology-invariant. Exactness holds for one step in f32; beyond that the
model's discrete selections (FPS ties, target assignment, NMS) can flip
on reduction-order noise and chaos-diverge, so later steps and final
weights are compared loosely. The reference has no multi-host mode at
all (single-process towers, trainer.py:120-149).

Covered cells: dp AND fsdp parallel modes under jax.distributed, and the
per-host input sharding path (each process loads only its own global-batch
rows; the losses must still match the full-batch single-process run
exactly at step 1)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

OPTS = [
    "TRAIN.CONFIG.BATCH_SIZE", "8",
    "TRAIN.CONFIG.MAX_ITERATIONS", "2",
    "TRAIN.CONFIG.CHECKPOINT_INTERVAL", "2",
    "TRAIN.CONFIG.SUMMARY_INTERVAL", "1",
    "TRAIN.AUGMENTATIONS.MIXUP.NUMBER", "(3, )",
    # f32: bf16 rounding differs between the 1x8 and 2x4 HLO partitionings,
    # which flips discrete selections and voids any step-wise comparison
    "TPU.COMPUTE_DTYPE", "float32",
]

CFG = "configs/kitti/3dssd/3dssd_tiny.yaml"


def _env(n_devices, extra=None):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra:
        env.update(extra)
    return env


def _train(cfg, run_dir, data_opts, env, opts=()):
    return subprocess.Popen(
        [sys.executable, "-m", "ssd3d.bin.train", "--cfg", cfg,
         "--log_dir", run_dir] + data_opts + OPTS + list(opts),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env,
    )


def _run_n_process(tmp_path, name, data_opts, opts=(), n_proc=2,
                   extra_env=None):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    run_dir = str(tmp_path / name)
    procs = [
        _train(CFG, run_dir, data_opts, _env(8 // n_proc, {
            "SSD3D_DIST_COORDINATOR": coord,
            "SSD3D_DIST_NUM_PROCESSES": str(n_proc),
            "SSD3D_DIST_PROCESS_ID": str(rank),
            **(extra_env or {}),
        }), opts)
        for rank in range(n_proc)
    ]
    try:
        outs = [pr.communicate(timeout=1800)[0] for pr in procs]
    finally:
        for pr in procs:  # never leave coordinated trainers behind on failure
            pr.kill()
    for pr, out in zip(procs, outs):
        assert pr.returncode == 0, out[-2000:]
    assert f"process 0/{n_proc}" in outs[0]
    assert f"process 1/{n_proc}" in outs[1]
    return run_dir, outs


def _run_two_process(tmp_path, name, data_opts, opts=()):
    return _run_n_process(tmp_path, name, data_opts, opts, n_proc=2)


@pytest.fixture(scope="module")
def baseline(tmp_path_factory):
    """Synthetic dataset + the single-process 8-device reference run."""
    tmp_path = tmp_path_factory.mktemp("multihost")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from synth_kitti import write_tree

    data_root = str(tmp_path / "kitti")
    npz_root = str(tmp_path / "npz")
    write_tree(data_root, n_train=6, n_val=2, n_points=2600, seed=5, k_max=3)
    data_opts = [
        "DATASET.KITTI.BASE_DIR_PATH", data_root,
        "DATASET.KITTI.TRAIN_LIST", os.path.join(data_root, "train.txt"),
        "DATASET.KITTI.VAL_LIST", os.path.join(data_root, "val.txt"),
        "DATASET.KITTI.SAVE_NUMPY_PATH", npz_root,
    ]
    p = subprocess.run(
        [sys.executable, "-m", "ssd3d.bin.preprocess", "--cfg", CFG,
         "--img_list", "train"] + data_opts + OPTS,
        capture_output=True, text=True, cwd=REPO, env=_env(8), timeout=600,
    )
    assert p.returncode == 0, p.stdout + p.stderr

    single = str(tmp_path / "run_single")
    proc = _train(CFG, single, data_opts, _env(8))
    try:
        out, _ = proc.communicate(timeout=1800)
    finally:
        proc.kill()
    assert proc.returncode == 0, out[-2000:]
    ms = [json.loads(l) for l in open(os.path.join(single, "metrics.jsonl"))]
    return tmp_path, data_opts, single, ms


def _check_against_baseline(ms_s, multi_dir, loose_weights_vs=None):
    ms_m = [json.loads(l)
            for l in open(os.path.join(multi_dir, "metrics.jsonl"))]
    assert [m["iter"] for m in ms_s] == [m["iter"] for m in ms_m] == [1, 2]
    skip = ("sec_per_it", "grad_norm")  # norm order-sensitive; time is time
    # step 1: same params, same global batch -> identical math
    for k, v in ms_s[0].items():
        if k in skip:
            continue
        np.testing.assert_allclose(v, ms_m[0][k], rtol=1e-3, atol=1e-5,
                                   err_msg=f"iter 1 metric {k}")
    # step 2: one update of reduction-order drift; loose
    np.testing.assert_allclose(ms_s[1]["total"], ms_m[1]["total"], rtol=0.1)

    if loose_weights_vs is not None:
        sys.path.insert(0, REPO)
        import jax
        from ssd3d.train.trainer import CheckpointManager

        raw_s, _ = CheckpointManager(
            os.path.join(loose_weights_vs, "ckpt")).restore_raw()
        raw_m, _ = CheckpointManager(
            os.path.join(multi_dir, "ckpt")).restore_raw()
        flat_s = jax.tree_util.tree_flatten_with_path(raw_s["params"])[0]
        flat_m = dict(jax.tree_util.tree_flatten_with_path(raw_m["params"])[0])
        for path, v in flat_s:
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(flat_m[path]), rtol=1e-2, atol=1e-2,
                err_msg=jax.tree_util.keystr(path),
            )


@pytest.mark.slow
def test_two_process_training_matches_single_process(baseline):
    tmp_path, data_opts, single, ms_s = baseline
    multi, outs = _run_two_process(tmp_path, "run_multi_dp", data_opts)
    # per-host input sharding engaged: each process loads only its 4 rows
    assert "per-host input sharding: rows [0, 4) of 8" in outs[0], outs[0][-2000:]
    assert "per-host input sharding: rows [4, 8) of 8" in outs[1], outs[1][-2000:]
    _check_against_baseline(ms_s, multi, loose_weights_vs=single)


@pytest.mark.slow
def test_two_process_fsdp_matches_single_process(baseline):
    """fsdp under jax.distributed: sharded optimizer/param state across the
    2x4 global mesh must reproduce the single-process dp losses at step 1
    (the missing parallel-mode x multi-process cell from round 2)."""
    tmp_path, data_opts, single, ms_s = baseline
    multi, outs = _run_two_process(
        tmp_path, "run_multi_fsdp", data_opts,
        opts=["TPU.PARALLEL_MODE", "fsdp"],
    )
    assert "per-host input sharding" in outs[0]
    _check_against_baseline(ms_s, multi)


@pytest.mark.slow
def test_four_process_interleaved_mesh_fallback(baseline):
    """4 coordinated processes (2 virtual devices each) under an
    INTERLEAVED mesh order (SSD3D_MESH_INTERLEAVE=2): each host's batch
    rows are non-contiguous, so the trainer must take the full-batch
    per-host loading fallback (trainer.py row_range else-branch) — and the
    global math must still match the single-process run exactly at step 1
    (sharding correctness is permutation-invariant)."""
    tmp_path, data_opts, single, ms_s = baseline
    multi, outs = _run_n_process(
        tmp_path, "run_multi4_interleaved", data_opts, n_proc=4,
        extra_env={"SSD3D_MESH_INTERLEAVE": "2"},
    )
    for out in outs:
        assert "full-batch fallback (non-contiguous rows" in out, out[-2000:]
        assert "per-host input sharding: rows [" not in out
    _check_against_baseline(ms_s, multi)
