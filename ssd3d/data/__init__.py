"""Dataset dispatch — the reference's `choose_dataset`
(lib/dataset/dataloader/__init__.py:8-13), config-driven by DATASET.TYPE.
Returns a constructed loader rather than a class: both loaders share the
`batches(batch_size, num_threads=..., num_procs=...)` / `load_sample` /
`augmentor` surface the runtimes consume.
"""

from __future__ import annotations


def build_loader(cfg, split: str, training: bool = True, seed: int = 0,
                 device_aug: bool = False, data_dir: str | None = None):
    dataset_type = cfg.DATASET.TYPE.upper()
    if dataset_type == "NUSCENES":
        from ssd3d.data.nuscenes import NuScenesLoader

        return NuScenesLoader(
            cfg, split, data_dir=data_dir, training=training, seed=seed
        )
    if dataset_type == "KITTI":
        from ssd3d.data.loader import KittiLoader

        return KittiLoader(
            cfg, split, data_dir=data_dir, training=training, seed=seed,
            device_aug=device_aug,
        )
    raise ValueError(f"unknown DATASET.TYPE {cfg.DATASET.TYPE!r}")
