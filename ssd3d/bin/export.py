"""Serving export: AOT-lower the inference function and serialize it with
`jax.export` into a self-contained artifact (weights baked in as
constants) that a serving process deserializes and calls WITHOUT the
framework, the config, or the checkpoint — the TPU-native equivalent of a
SavedModel dump.

The reference has no serving story at all: its "inference" is re-running
the training graph in a TF session from a checkpoint (lib/core/tester.py).
Here the whole detector — backbone, heads, decode, NMS — is one traced
program, so one artifact serves it.

    python -m ssd3d.bin.export --cfg <yaml> --log_dir runs/3dssd \
        --out runs/3dssd/detector.jaxexp [--batch 8] \
        [--symbolic_batch] [--platforms tpu,cpu]

Load side (no ssd3d import needed):

    from jax import export
    exported = export.deserialize(open(path, 'rb').read())
    det = exported.call(points)   # {'boxes', 'scores', 'classes', 'valid'}

Notes:
- `--symbolic_batch` exports with a symbolic leading dim so one artifact
  serves any batch size.
- Exporting ON a TPU host embeds the Pallas kernels as custom calls;
  these are not covered by jax.export's compatibility guarantees, so
  `--allow_custom_calls` must be passed explicitly (the artifact is then
  pinned to a compatible libtpu). Exporting from a CPU host traces the
  pure-XLA fallback path, which serializes without caveats and still
  compiles onto TPU at load time.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
from jax import export as jexport

from ssd3d.config import load_cfg
from ssd3d.models.api import build_pipeline
from ssd3d.train.trainer import CheckpointManager, restore_from_path


def export_infer(pipeline, variables, batch: int, n_points: int,
                 platforms: list[str] | None = None,
                 symbolic_batch: bool = False,
                 allow_custom_calls: bool = False):
    """AOT-lower `pipeline.infer` with `variables` baked in; returns the
    jax.export.Exported object."""

    def serve(points):
        return pipeline.infer(variables, points)

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, n_points, 4), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, n_points, 4), jnp.float32)
    checks = (
        [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
        if allow_custom_calls else []
    )
    return jexport.export(
        jax.jit(serve),
        platforms=platforms,
        disabled_checks=checks,
    )(spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--log_dir", required=True)
    ap.add_argument("--out", default=None,
                    help="artifact path (default <log_dir>/detector.jaxexp)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--symbolic_batch", action="store_true",
                    help="export with a symbolic batch dim (any batch size)")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. tpu,cpu "
                    "(default: the current backend)")
    ap.add_argument("--allow_custom_calls", action="store_true",
                    help="permit Pallas TPU custom calls in the artifact "
                    "(no cross-version compatibility guarantee)")
    ap.add_argument("--restore_model_path", default=None,
                    help="checkpoint to embed (run dir, ckpt dir, or step "
                    "dir); defaults to the latest under --log_dir/ckpt")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()
    cfg = load_cfg(args.cfg, args.opts)

    pipeline = build_pipeline(cfg)
    n_points = cfg.MODEL.POINTS_NUM_FOR_TRAINING
    example = jnp.zeros((1, n_points, 4), jnp.float32)
    template = pipeline.graph.init_state(jax.random.PRNGKey(0), example)
    if args.restore_model_path:
        state, step = restore_from_path(args.restore_model_path, template)
    else:
        ckpt = CheckpointManager(os.path.join(args.log_dir, "ckpt"))
        state, step = ckpt.restore(template)
    assert state is not None, f"no checkpoint under {args.log_dir}/ckpt"
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    platforms = args.platforms.split(",") if args.platforms else None
    exported = export_infer(
        pipeline, variables, args.batch, n_points, platforms,
        args.symbolic_batch, args.allow_custom_calls,
    )
    blob = exported.serialize()
    out = args.out or os.path.join(args.log_dir, "detector.jaxexp")
    with open(out, "wb") as f:
        f.write(blob)
    meta = {
        "cfg": os.path.abspath(args.cfg),
        "checkpoint_step": step,
        "input": [
            "b" if args.symbolic_batch else args.batch, n_points, 4
        ],
        "platforms": list(exported.platforms),
        "cls_list": list(pipeline.cls_list),
        "bytes": len(blob),
    }
    with open(out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported step {step} -> {out} "
          f"({len(blob) / 1e6:.1f} MB, platforms={list(exported.platforms)})")


if __name__ == "__main__":
    main()
