"""Single-chip end-to-end inference benchmark for the flagship 3DSSD config.

Prints ONE JSON line whose primary fields are the driver contract:
    {"metric": "kitti_3dssd_scans_per_sec", "value": N, "unit": "scans/s",
     "vs_baseline": N / 25.0, ...supplementary fields...}
Baseline: the reference claims >25 FPS single-GPU inference (README.md:10) —
a batch-1 real-scan number, so alongside the batch-8 pipelined headline this
also reports batch-1 latency and a realistic (ground-plane + car clusters +
clutter) point distribution, not just uniform noise.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _realistic_scans(batch: int, n: int) -> np.ndarray:
    """KITTI-like scans from the synthetic scene generator: ground plane,
    car shells, clutter blobs — realistic neighborhood statistics for the
    ball-query/NMS load, unlike uniform noise."""
    from tools.synth_kitti import make_scene

    rng = np.random.default_rng(0)
    out = np.zeros((batch, n, 4), np.float32)
    for b in range(batch):
        pts, _ = make_scene(rng, n_points=n + 2048, k_max=6)
        sel = rng.choice(len(pts), n, replace=len(pts) < n)
        out[b] = pts[sel]
    return out


def _throughput(infer, variables, x, iters=10):
    """Pipelined throughput: submit `iters` batches, fetch one scalar from
    the LAST output (device executes in submission order; block_until_ready
    returns early through the remote tunnel). Fresh inputs each iteration
    guard against relay result-caching."""
    import jax.numpy as jnp

    float(infer(variables, x)["scores"].sum())  # compile + settle
    float(infer(variables, x + jnp.float32(1e-3))["scores"].sum())
    t0 = time.perf_counter()
    outs = [infer(variables, x + jnp.float32((i + 2) * 1e-3))
            for i in range(iters)]
    checksum = float(outs[-1]["scores"].sum())
    dt = time.perf_counter() - t0
    assert checksum == checksum
    return x.shape[0] * iters / dt


def _latency(infer, variables, x, iters=10):
    """Batch-1 blocking latency: each iteration fetches its own scalar, so
    nothing pipelines."""
    import jax.numpy as jnp

    float(infer(variables, x)["scores"].sum())
    float(infer(variables, x + jnp.float32(1e-3))["scores"].sum())
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(infer(variables, x + jnp.float32((i + 2) * 1e-3))["scores"].sum())
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship

    cfg, model, spec, n = _flagship()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    real = _realistic_scans(batch, n)
    rng = np.random.RandomState(0)
    uniform = rng.uniform(-1, 1, (batch, n, 4)).astype(np.float32)
    uniform *= np.array([40, 2, 35, 1], np.float32)
    uniform[..., 2] += 35.0

    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.asarray(real[:1]), False
    )

    @jax.jit
    def infer(v, p):
        out = model.apply(v, p, False)
        return spec.decode_and_nms(out)

    tput_real = _throughput(infer, variables, jnp.asarray(real))
    tput_uniform = _throughput(infer, variables, jnp.asarray(uniform))
    lat_b1 = _latency(infer, variables, jnp.asarray(real[:1]))

    # Transport floor: blocking round-trip of a TRIVIAL compiled op through
    # the same dispatch path. On a tunneled/remote backend this dominates the
    # batch-1 wall latency (benchmarks/rtt_floor.json measured 26.6 ms median
    # for the axon tunnel); batch1_net_ms is the model's share of the wall
    # number once the transport is subtracted (device-trace truth is ~10 ms,
    # benchmarks/profile_batch1.json).
    tiny = jnp.zeros((8,), jnp.float32)
    triv = jax.jit(lambda t: t + 1.0)
    float(triv(tiny)[0])
    # perturbed inputs prepared OUTSIDE the timed region so iteration 0
    # doesn't pay the eager add's trace/compile
    tinies = [jax.block_until_ready(tiny + jnp.float32(i)) for i in range(8)]
    floor_times = []
    for t in tinies:
        t0 = time.perf_counter()
        float(triv(t)[0])
        floor_times.append(time.perf_counter() - t0)
    floor = float(np.median(floor_times))

    # Direct pipelined batch-1 throughput: the sustained single-scan rate,
    # measured with no transport-floor subtraction (each submit overlaps the
    # previous fetch). This is the primary batch-1 number; batch1_latency_ms
    # is the blocking wall time and batch1_net_ms the subtraction estimate.
    b1_pipelined = _throughput(infer, variables, jnp.asarray(real[:1]),
                               iters=30)

    # MFU: XLA's analytical FLOP count for the compiled step, achieved at
    # the measured scan rate, against the v5e bf16 peak (197 TFLOP/s;
    # f32-HIGHEST matmuls burn multiple bf16 passes, so this is the honest
    # "of what the MXU could do, how much does the model's math use" ratio)
    mfu_fields = {}
    try:
        cost = infer.lower(variables, jnp.asarray(real)).compile().cost_analysis()
        flops_batch = float(cost.get("flops", 0.0))
        if flops_batch > 0:
            peak = 197e12
            mfu_fields = {
                "model_gflops_per_scan": round(flops_batch / batch / 1e9, 2),
                "mfu": round(flops_batch / batch * tput_real / peak, 4),
            }
    except Exception:
        pass

    print(json.dumps({
        "metric": "kitti_3dssd_scans_per_sec",
        "value": round(tput_real, 2),
        "unit": "scans/s",
        "vs_baseline": round(tput_real / 25.0, 3),
        "distribution": "realistic(ground+cars+clutter)",
        "batch": batch,
        "uniform_scans_per_sec": round(tput_uniform, 2),
        "batch1_latency_ms": round(lat_b1 * 1e3, 2),
        "batch1_scans_per_sec": round(1.0 / lat_b1, 2),
        "batch1_pipelined_scans_per_sec": round(b1_pipelined, 2),
        "transport_floor_ms": round(floor * 1e3, 2),
        # unclamped: negative means the trivial round-trip measured SLOWER
        # than the model step (anomalous run) — surfaced, not hidden
        "batch1_net_ms": round((lat_b1 - floor) * 1e3, 2),
        "batch1_net_clamped": bool(lat_b1 < floor),
        **mfu_fields,
    }))


if __name__ == "__main__":
    main()
