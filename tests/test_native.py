"""Native C++ components vs their numpy twins."""

import time

import numpy as np
import pytest

from ssd3d import native
from ssd3d.eval.kitti_ap import eval_class
from test_kitti_eval import make_obj, scene


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native library not built and no compiler available")
    return lib


def _random_eval_data(rng, n_images=25):
    gts, dets = [], []
    for i in range(n_images):
        frame = scene(rng, 4)
        # one van + one dontcare for the special-case paths
        frame.append(make_obj(x=rng.uniform(-30, 30), z=70, typ="Van"))
        frame.append(make_obj(x=rng.uniform(-30, 30), z=75, typ="DontCare"))
        gts.append(frame)
        d = []
        for o in frame[:4]:
            if rng.rand() < 0.8:  # drop some -> FNs
                d.append(make_obj(
                    o.t[0] + rng.uniform(-0.4, 0.4),
                    o.t[2] + rng.uniform(-0.4, 0.4),
                    o.ry + rng.uniform(-0.1, 0.1),
                    o.l, o.h, o.w, o.t[1], score=rng.rand(),
                ))
        for _ in range(rng.randint(0, 3)):  # FPs
            d.append(make_obj(rng.uniform(-30, 30), rng.uniform(40, 60),
                              score=rng.rand()))
        dets.append(d)
    return gts, dets


@pytest.mark.parametrize("metric", ["image", "ground", "3d"])
@pytest.mark.parametrize("difficulty", [0, 1, 2])
def test_native_matches_numpy(lib, rng, metric, difficulty):
    gts, dets = _random_eval_data(rng)
    p_np, aos_np = eval_class(gts, dets, 0, difficulty, metric,
                              compute_aos=(metric == "image"),
                              use_native=False)
    p_cc, aos_cc = eval_class(gts, dets, 0, difficulty, metric,
                              compute_aos=(metric == "image"),
                              use_native=True)
    np.testing.assert_allclose(p_cc, p_np, atol=1e-6)
    if aos_np is not None:
        np.testing.assert_allclose(aos_cc, aos_np, atol=1e-6)


def test_native_is_faster(lib, rng):
    gts, dets = _random_eval_data(rng, n_images=60)
    t0 = time.perf_counter()
    eval_class(gts, dets, 0, 1, "3d", use_native=False)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    eval_class(gts, dets, 0, 1, "3d", use_native=True)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_np, (t_cc, t_np)


def test_voxel_budget_native_matches_numpy(lib, rng):
    pts = rng.uniform(-45, 45, (20000, 4)).astype(np.float32)
    pts[:, 1] = rng.uniform(-4, 2, 20000)
    pts[:5000] = pts[0]  # pile into one voxel
    vs = (0.2, 0.2, 0.2)
    lo = (-50.0, -5.0, -50.0)
    hi = (50.0, 3.0, 50.0)
    keep = native.voxel_budget_flags_native(pts, vs, lo, hi, 10)
    # numpy twin: first-come cap per voxel
    coords = np.floor((pts[:, :3] - np.asarray(lo)) / np.asarray(vs)).astype(np.int64)
    grid = np.ceil((np.asarray(hi) - np.asarray(lo)) / np.asarray(vs)).astype(np.int64)
    inside = np.all((pts[:, :3] > lo) & (pts[:, :3] < hi), axis=1)
    flat = (coords[:, 0] * grid[1] + coords[:, 1]) * grid[2] + coords[:, 2]
    want = np.zeros(len(pts), bool)
    seen: dict = {}
    for i in np.where(inside)[0]:
        c = seen.get(flat[i], 0)
        if c < 10:
            seen[flat[i]] = c + 1
            want[i] = True
    np.testing.assert_array_equal(keep, want)
