"""nuScenes val-split inference + mAP/NDS evaluation + submission dump.

The reference's nuScenes evaluate path is unfinished and never ran
(SURVEY §2.9; nuscenes_dataloader.py references undefined names), so this
module implements its intent: run the detector over the preprocessed val
split, score with the devkit-exact metrics in eval/nuscenes_eval.py, and
select checkpoints by NDS. The prediction dump mirrors the official
submission schema (results keyed by sample token) but keeps boxes in the
framework-wide camera-style frame — `cast_boxes_to_kitti` is its own
inverse modulo the yaw sign, documented per record.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ssd3d.eval.nuscenes_eval import NuscBox, evaluate_nuscenes


def detections_to_nusc_boxes(boxes, scores, classes, cls_list,
                             velocity=None, attr_logits=None) -> list:
    """One scan's thresholded detections -> NuscBox list.

    boxes [n, 7] box_3d; velocity [n, 2] (vx, vz) or None; attr_logits
    [n, 8] head logits or None (argmax -> attribute id)."""
    out = []
    for i in range(len(boxes)):
        b = np.asarray(boxes[i], np.float64)
        out.append(NuscBox(
            cls=cls_list[int(classes[i])],
            center=b[0:3],
            size=b[3:6],
            ry=float(b[6]),
            velocity=(np.asarray(velocity[i], np.float64)
                      if velocity is not None else np.zeros(2)),
            attribute=(int(np.argmax(attr_logits[i]))
                       if attr_logits is not None else -1),
            score=float(scores[i]),
        ))
    return out


def gt_batch_to_nusc_boxes(gt_boxes, gt_labels, cls_list,
                           gt_velocity=None, gt_attribute=None) -> list:
    """One scan's padded GT arrays -> NuscBox list (labels are 1-based,
    0 = padding)."""
    out = []
    for i in range(len(gt_boxes)):
        lab = int(gt_labels[i])
        if lab <= 0:
            continue
        b = np.asarray(gt_boxes[i], np.float64)
        out.append(NuscBox(
            cls=cls_list[lab - 1],
            center=b[0:3],
            size=b[3:6],
            ry=float(b[6]),
            velocity=(np.asarray(gt_velocity[i], np.float64)
                      if gt_velocity is not None else np.zeros(2)),
            attribute=(int(gt_attribute[i])
                       if gt_attribute is not None else -1),
        ))
    return out


def run_inference_on_split(cfg, infer_fn, cls_list, variables, loader,
                           cls_thresh=0.0, save_path=None, log=print,
                           limit=None, batch_size=1):
    """Run the jitted detector over a NuScenesLoader split.

    Returns (det_per_frame, gt_per_frame, names) as NuscBox lists. When
    `save_path` is given, also writes a submission-style JSON:
    {"results": {sample_token: [record, ...]}} with camera-frame boxes.
    batch_size > 1 shards the forward's batch axis over all visible
    devices (see predictions.run_inference_on_split — same TPU extension,
    trailing partial batch padded by repetition)."""
    import jax
    import jax.numpy as jnp

    if batch_size > 1:
        from ssd3d.parallel import batch_sharding, make_mesh, replicated

        n_dev = len(jax.devices())
        if batch_size % n_dev:
            batch_size += n_dev - batch_size % n_dev
        mesh = make_mesh(n_dev)
        bsh, rep = batch_sharding(mesh), replicated(mesh)
        infer = jax.jit(infer_fn, in_shardings=(rep, bsh))
        variables = jax.device_put(variables, rep)
    else:
        infer = jax.jit(infer_fn)
    dets, gts, names = [], [], []
    dump = {}
    count = 0
    done = False
    stream = loader.batches(1, epochs=1, num_threads=1, shuffle=False)
    while not done:
        block = []
        for b in stream:
            block.append(b)
            if len(block) == batch_size:
                break
        if not block:
            break
        n_real = len(block)
        done = n_real < batch_size
        pts = np.concatenate(
            [b["points"] for b in block]
            + [block[-1]["points"]] * (batch_size - n_real)
        )
        out = infer(variables, jnp.asarray(pts))
        out = {k: np.asarray(v) for k, v in out.items()}
        for i in range(n_real):
            batch = block[i]
            det = {k: v[i] for k, v in out.items()}
            keep = det["valid"] & (det["scores"] >= cls_thresh)
            boxes = det["boxes"][keep]
            scores = det["scores"][keep]
            classes = det["classes"][keep]
            velocity = det["velocity"][keep] if "velocity" in det else None
            attr = det["attribute"][keep] if "attribute" in det else None
            dets.append(detections_to_nusc_boxes(
                boxes, scores, classes, list(cls_list), velocity, attr
            ))
            gts.append(gt_batch_to_nusc_boxes(
                batch["gt_boxes"][0], batch["gt_labels"][0], list(cls_list),
                batch.get("gt_velocity", [None])[0],
                batch.get("gt_attribute", [None])[0],
            ))
            name = batch["names"][0]
            names.append(name)
            if save_path is not None:
                dump[str(name)] = [
                    {
                        "sample_token": str(name),
                        "translation_cam": [float(v) for v in b.center],
                        "size_lhw": [float(v) for v in b.size],
                        "yaw_cam": b.ry,
                        "velocity_cam": [float(v) for v in b.velocity],
                        "detection_name": b.cls,
                        "detection_score": b.score,
                        "attribute_id": b.attribute,
                    }
                    for b in dets[-1]
                ]
            count += 1
            if count % 200 == 0:
                log(f"inference {count} frames")
            if limit and count >= limit:
                done = True
                break
    if save_path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)),
                    exist_ok=True)
        with open(save_path, "w") as f:
            json.dump({"meta": {"use_lidar": True}, "results": dump}, f)
    return dets, gts, names


def evaluate_split(cfg, det_per_frame, gt_per_frame, cls_list, log=print):
    """mAP/NDS tables + the NDS selection metric (the nuScenes analogue of
    predictions.evaluate_split's Car-Moderate-3D)."""
    results = evaluate_nuscenes(gt_per_frame, det_per_frame, list(cls_list))
    for cls_name, entry in results["per_class"].items():
        errs = " ".join(
            f"{k}={entry[k]:.3f}" for k in ("trans", "scale", "orient",
                                            "vel", "attr") if k in entry
        )
        log(f"{cls_name:20s} mAP {entry['mean_ap']:.4f} {errs}")
    log(f"mAP {results['mAP']:.4f} NDS {results['NDS']:.4f}")
    return results, float(results["NDS"]) * 100.0
