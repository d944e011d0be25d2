"""First-class profiling hooks (the reference has none — SURVEY §5: only
wall-clock prints).

- `trace(...)`: context manager around jax.profiler capturing a device trace.
- `summarize_trace(...)`: parse the trace-viewer JSON and aggregate device op
  durations — readable without TensorBoard.
- `Stopwatch`: value-fetching step timer that is correct on async backends
  (block_until_ready alone under-reports through remote tunnels).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 30, by_category: bool = False):
    """Aggregate device op durations from the newest trace under log_dir.

    Returns a list of (name, total_ms) sorted descending."""
    files = sorted(
        glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not files:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    agg: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        args = e.get("args", {})
        if e.get("ph") == "X" and "dur" in e and args.get("hlo_category"):
            key = (
                args["hlo_category"] if by_category else e.get("name", "?")
            )
            agg[key] += e["dur"]
    return [(k, v / 1e3) for k, v in agg.most_common(top)]


class Stopwatch:
    """Correct step timing on async/remote backends: forces completion by
    fetching a scalar from the step output."""

    def __init__(self):
        self._t0 = None
        self.laps: list = []

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def lap(self, output=None) -> float:
        if output is not None:
            leaf = jax.tree.leaves(output)[0]
            float(jnp.asarray(leaf).ravel()[0])  # forces device completion
        dt = time.perf_counter() - self._t0
        self.laps.append(dt)
        self._t0 = time.perf_counter()
        return dt

    @property
    def mean(self) -> float:
        return sum(self.laps) / max(len(self.laps), 1)
