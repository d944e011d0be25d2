"""Dump the optimized HLO for the flagship step and summarize layout copies.

The device trace (tools/profile_step.py) shows ~15 ms/step of
"data formatting" — dominated by four ~4.9 ms `copy` ops, one per SA
layer. This tool compiles the same jitted functions and greps the
optimized module for copy/transpose/bitcast-convert instructions, with
their shapes and layouts, so the seam can be located and fixed rather
than guessed at. Run on the target backend (layout assignment is
backend-specific — CPU HLO will not show the TPU copies).

Usage:
    python tools/dump_hlo.py [--cfg ...] [--what infer|fwd|train]
                             [--out /tmp/hlo.txt]
Prints a per-copy summary (name, bytes, operand) and writes the full
optimized HLO text for inspection.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    width = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
             "u8": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "f64": 8}
    return n * width.get(dtype, 4)


def summarize_copies(hlo_text: str, top: int = 25):
    """Extract copy/transpose instructions sorted by tensor size."""
    rows = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(%?[\w.-]+) = (\S+) (copy|transpose)\((.*?)\)", line)
        if not m:
            continue
        name, shape, kind, operands = m.groups()
        rows.append((_shape_bytes(shape), name, kind, shape, operands[:90]))
    rows.sort(reverse=True)
    return rows[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/kitti/3dssd/3dssd.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--what", default="fwd", choices=["fwd", "infer", "train"])
    ap.add_argument("--out", default="/tmp/hlo_opt.txt")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (layouts differ from TPU; "
                    "smoke-testing only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ssd3d.config import load_cfg
    from ssd3d.models.api import build_pipeline

    cfg = load_cfg(args.cfg, [])
    pipeline = build_pipeline(cfg)
    model, graph = pipeline.model, pipeline.graph

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(args.batch, args.points, 4)).astype(np.float32))
    state = graph.init_state(jax.random.PRNGKey(0), x[:1])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.what == "fwd":
        fn = jax.jit(lambda v, p: model.apply(v, p, False))
        lowered = fn.lower(variables, x)
    elif args.what == "infer":
        fn = jax.jit(pipeline.infer)
        lowered = fn.lower(variables, x)
    else:
        batch = {
            "points": x,
            "gt_boxes": jnp.zeros((args.batch, 64, 7), jnp.float32),
            "gt_labels": jnp.zeros((args.batch, 64), jnp.int32),
        }
        fn = jax.jit(graph.train_step)
        lowered = fn.lower(state, batch, jax.random.PRNGKey(1))

    compiled = lowered.compile()
    text = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(text)

    print(f"backend={jax.default_backend()} what={args.what} "
          f"hlo={len(text.splitlines())} lines -> {args.out}")
    print(f"{'MB':>8}  {'kind':<9} {'name':<18} shape / operand")
    for nbytes, name, kind, shape, ops in summarize_copies(text):
        print(f"{nbytes / 1e6:8.2f}  {kind:<9} {name:<18} {shape}  <- {ops}")


if __name__ == "__main__":
    main()
