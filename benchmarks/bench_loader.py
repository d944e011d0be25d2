"""Host input-pipeline throughput: can the loader feed the chip?

Measures samples/s over a synthetic KITTI split for:
  - eval mode (no augmentation)         target: >= chip inference rate
  - train mode, full augmentation chain target: >= chip train consumption
  - train mode, device-aug offload      (host does IO+budget only)
each with thread and process workers.

    PYTHONPATH=. python benchmarks/bench_loader.py [n_scans] [batch]

Replaces the reference's unmeasured ZMQ-pipeline throughput claim
(lib/dataset/data_provider/data_provider.py:265-404) with numbers.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from ssd3d.config import load_cfg  # noqa: E402
from ssd3d.data.loader import KittiLoader  # noqa: E402
from ssd3d.data.preprocess import run_preprocess  # noqa: E402
from tools.synth_kitti import write_tree  # noqa: E402


def measure(loader, batch_size, n_batches, **kw):
    it = loader.batches(batch_size, epochs=100, **kw)
    next(it)  # warm-up (worker start, first file reads)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return batch_size * n_batches / dt


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_batches = max(48 // batch, 4)

    root = tempfile.mkdtemp(prefix="bench_loader_")
    try:
        write_tree(root + "/kitti", n_scans, 0, n_points=20000, seed=1)
        cfg = load_cfg("/root/repo/configs/kitti/3dssd/3dssd.yaml", [
            "DATASET.KITTI.BASE_DIR_PATH", root + "/kitti",
            "DATASET.KITTI.TRAIN_LIST", root + "/kitti/train.txt",
            "DATASET.KITTI.SAVE_NUMPY_PATH", root + "/npz",
            "TRAIN.AUGMENTATIONS.MIXUP.NUMBER", "(8, )",
        ])
        run_preprocess(cfg, "train", log=lambda *a: None)

        results = {}
        modes = [
            ("eval", dict(training=False), {}),
            ("train_aug", dict(training=True), {}),
            ("train_device_aug", dict(training=True, device_aug=True), {}),
        ]
        for name, lkw, _ in modes:
            loader = KittiLoader(cfg, "train", seed=0, **lkw)
            results[f"{name}_threads4"] = round(
                measure(loader, batch, n_batches, num_threads=4), 1)
            loader = KittiLoader(cfg, "train", seed=0, **lkw)
            results[f"{name}_procs4"] = round(
                measure(loader, batch, n_batches, num_procs=4), 1)
        results["unit"] = "samples/s"
        results["batch"] = batch
        print(json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
