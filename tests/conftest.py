"""Test harness: run everything on CPU with 8 virtual devices so sharding /
collective code paths are exercised without TPU hardware (the strategy the
reference lacked entirely — it had no distributed tests, SURVEY.md §4.5)."""

import os

# Force CPU regardless of the ambient platform. NOTE: the axon sitecustomize
# imports jax at interpreter start, so env vars alone are too late — the
# platform must be overridden through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (tiny shapes, one
# CPU core); re-runs load executables from disk instead of re-lowering.
# Measured ~3x on compile-heavy tests. /tmp so no artifacts land in the repo.
from jax.experimental.compilation_cache import compilation_cache as _cc  # noqa: E402

_cc.set_cache_dir("/tmp/ssd3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
# NOTE: jax_disable_most_optimizations was tried here for compile speed
# (~27% off the heaviest fixtures) and REVERTED: it changes training
# dynamics enough that the tiny overfit stops converging
# (test_train_step_decreases_loss fails under it).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_boxes(rng, n, scale=20.0):
    """Random plausible KITTI-frame boxes_3d [n, 7]."""
    ctr = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    ctr[:, 1] = rng.uniform(0.5, 2.5, size=n)  # y (bottom face, camera down)
    ctr[:, 2] = rng.uniform(5.0, scale * 2, size=n)
    size = rng.uniform(0.5, 5.0, size=(n, 3)).astype(np.float32)
    ry = rng.uniform(-np.pi, np.pi, size=(n, 1)).astype(np.float32)
    return np.concatenate([ctr, size, ry], axis=1).astype(np.float32)
