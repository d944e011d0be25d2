"""End-to-end device profile of the flagship 3DSSD forward (and optionally
the train step): jax.profiler trace -> aggregated device-op table.

    PYTHONPATH=. python benchmarks/profile_e2e.py [infer|train] [batch]

Falls back to a phase-ablation wall-clock breakdown if the backend does not
support device tracing through the tunnel.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship
from ssd3d.utils.profiling import trace, summarize_trace


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "infer"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    cfg, model, spec, n = _flagship()
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (batch, n, 4)).astype(np.float32)
    pts *= np.array([40, 2, 35, 1], np.float32)
    pts[..., 2] += 35.0
    x = jnp.asarray(pts)

    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x[:1], False
    )

    if mode == "infer":
        @jax.jit
        def step(v, p):
            out = model.apply(v, p, False)
            return spec.decode_and_nms(out)

        args = lambda i: (variables, x + jnp.float32(i) * 1e-3)
    else:
        from ssd3d.train.train_step import TrainGraph

        graph = TrainGraph.build(cfg, model, spec)
        gt = np.zeros((batch, 64, 7), np.float32)
        gt[:, :2] = np.array([[5, 1.5, 20, 3.9, 1.6, 1.5, 0.3],
                              [-5, 1.5, 30, 3.9, 1.6, 1.5, -0.5]], np.float32)
        labels = np.zeros((batch, 64), np.int32)
        labels[:, :2] = 1
        state = graph.init_state(jax.random.PRNGKey(0), x[:1])
        tbatch = {"points": x, "gt_boxes": jnp.asarray(gt),
                  "gt_labels": jnp.asarray(labels)}
        jstep = jax.jit(graph.train_step, donate_argnums=(0,))

        def step(v, p):
            nonlocal state
            state, metrics = jstep(state, {**tbatch, "points": p},
                                   jax.random.PRNGKey(1))
            return metrics

        args = lambda i: (None, x + jnp.float32(i) * 1e-3)

    # compile + settle
    out = step(*args(0))
    jax.block_until_ready(out)
    float(jax.tree.leaves(out)[0].sum() if hasattr(
        jax.tree.leaves(out)[0], "sum") else 0.0)

    log_dir = "/tmp/ssd3d_trace"
    try:
        with trace(log_dir):
            for i in range(1, 6):
                out = step(*args(i))
            jax.block_until_ready(out)
        print("== top device ops (ms across 5 iters) ==")
        for name, ms in summarize_trace(log_dir, top=40):
            print(f"{ms:10.3f}  {name}")
        print("== by hlo category ==")
        for name, ms in summarize_trace(log_dir, top=20, by_category=True):
            print(f"{ms:10.3f}  {name}")
    except Exception as exc:
        print(f"trace failed ({exc!r}); wall-clock only")

    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        out = step(*args(100 + i))
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{mode} batch={batch}: {dt * 1000:.1f} ms/step "
          f"({batch / dt:.1f} scans/s)")


if __name__ == "__main__":
    main()
