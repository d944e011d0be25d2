"""Training CLI (reference lib/core/trainer.py).

    python -m ssd3d.bin.train --cfg configs/kitti/3dssd/3dssd.yaml \
        --log_dir runs/3dssd [KEY VALUE ...]
"""

import argparse

from ssd3d.config import load_cfg
from ssd3d.parallel import initialize_from_env
from ssd3d.train.trainer import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--log_dir", default="runs/default")
    ap.add_argument("--split", default="train")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max_iterations", type=int, default=None)
    ap.add_argument("--restore_model_path", default=None,
                    help="warm-start weights from another run dir (or its "
                    "ckpt dir): name-intersect transfer restore, as the "
                    "reference trainer's flag of the same name; used for "
                    "PointRCNN stage-2 training")
    ap.add_argument("--restore_tf_checkpoint", default=None,
                    help="initialize weights from a reference TF-1 "
                    "checkpoint (name-mapped conversion, incl. BN stats; "
                    "single- and two-stage models) — the reference loads "
                    "TF checkpoints through --restore_model_path "
                    "(trainer.py:161-174)")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    initialize_from_env()  # multi-host: no-op unless SSD3D_DIST_* is set
    cfg = load_cfg(args.cfg, args.opts)
    Trainer(cfg, args.log_dir, args.split, args.seed,
            restore_model_path=args.restore_model_path,
            restore_tf_checkpoint=args.restore_tf_checkpoint,
            ).train(args.max_iterations)


if __name__ == "__main__":
    main()
