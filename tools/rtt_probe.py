"""Measure the dispatch+fetch round-trip floor of the current backend.

A batch-1 'blocking latency' number includes one host->device dispatch and
one device->host scalar fetch; on a tunneled TPU that transport floor is
not attributable to the model. This probe times a trivial compiled op with
the same Stopwatch discipline as bench.py (fresh input + scalar fetch per
iteration) — the median is the floor to subtract when reading
benchmarks/profile_batch1.json.

    python tools/rtt_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((8, 128))

    @jax.jit
    def tiny(v):
        return (v * 1.0001).sum()

    float(tiny(x))
    float(tiny(x + 1e-3))
    laps = []
    for i in range(16):
        y = x + jnp.float32(i + 2) * 1e-3
        y.block_until_ready()
        t0 = time.perf_counter()
        float(tiny(y))
        laps.append(time.perf_counter() - t0)
    print(json.dumps({
        "backend": jax.default_backend(),
        "rtt_floor_ms_median": round(float(np.median(laps)) * 1e3, 3),
        "rtt_floor_ms_min": round(float(np.min(laps)) * 1e3, 3),
        "laps_ms": [round(l * 1e3, 2) for l in laps],
    }))


if __name__ == "__main__":
    main()
