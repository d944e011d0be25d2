"""Offline preprocessing CLI (reference lib/core/data_preprocessor.py).

    python -m ssd3d.bin.preprocess --cfg configs/kitti/3dssd/3dssd.yaml \
        --img_list train [--limit N]
"""

import argparse

from ssd3d.config import load_cfg
from ssd3d.data.preprocess import run_preprocess


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--img_list", default="train",
                    choices=["train", "val", "trainval", "test"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    cfg = load_cfg(args.cfg, args.opts)
    if cfg.DATASET.TYPE.upper() == "NUSCENES":
        from ssd3d.data.nuscenes import convert_raw_nuscenes

        ncfg = cfg.DATASET.NUSCENES
        convert_raw_nuscenes(
            ncfg.VERSION, ncfg.BASE_DIR_PATH, ncfg.SAVE_NUMPY_PATH,
            nsweeps=ncfg.NSWEEPS,
            feature_channels=ncfg.INPUT_FEATURE_CHANNEL,
            val_scenes=ncfg.VAL_SCENE_LIST or None,
        )
        return
    if args.img_list in ("val", "test"):
        cfg.TRAIN.AUGMENTATIONS.MIXUP.OPEN = False
    run_preprocess(cfg, args.img_list, limit=args.limit)


if __name__ == "__main__":
    main()
