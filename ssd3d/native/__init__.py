"""ctypes bridge to the native (C++) runtime components.

Build: `make -C ssd3d/native` (g++, no external deps). Every entry point has
a pure-numpy fallback so the framework works unbuilt; tests cross-check the
two implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libssd3d_native.so")
_lib = None
_tried = False


def load(build_if_missing: bool = True):
    """Returns the loaded library or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.kitti_eval_class.restype = ctypes.c_int
    lib.kitti_eval_class.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.voxel_budget_flags.restype = ctypes.c_int64
    lib.voxel_budget_flags.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def kitti_eval_class_native(gt_rows, gt_counts, det_rows, det_counts,
                            cls: int, difficulty: int, metric: int,
                            min_overlap: float, compute_aos: bool):
    """gt_rows: [sum_gt, 15] f32; det_rows: [sum_det, 14] f32 (see
    kitti_eval.cc for layouts). Returns (precision[41], aos[41] or None)."""
    lib = load()
    assert lib is not None, "native library not built"
    gt_rows = np.ascontiguousarray(gt_rows, np.float32)
    det_rows = np.ascontiguousarray(det_rows, np.float32)
    gt_counts = np.ascontiguousarray(gt_counts, np.int32)
    det_counts = np.ascontiguousarray(det_counts, np.int32)
    precision = np.zeros(41, np.float64)
    aos = np.zeros(41, np.float64)
    ret = lib.kitti_eval_class(
        _fptr(gt_rows),
        gt_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _fptr(det_rows),
        det_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(gt_counts), cls, difficulty, metric, min_overlap,
        1 if compute_aos else 0,
        precision.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        aos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    assert ret == 0
    return precision, (aos if compute_aos else None)


def voxel_budget_flags_native(points: np.ndarray, voxel_size, range_lo,
                              range_hi, max_per_voxel: int) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library not built"
    pts = np.ascontiguousarray(points, np.float32)
    vs = np.ascontiguousarray(voxel_size, dtype=np.float32)
    lo = np.ascontiguousarray(range_lo, dtype=np.float32)
    hi = np.ascontiguousarray(range_hi, dtype=np.float32)
    keep = np.zeros(len(pts), np.uint8)
    kept = lib.voxel_budget_flags(
        _fptr(pts), len(pts), pts.shape[1], _fptr(vs), _fptr(lo), _fptr(hi),
        max_per_voxel, keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    assert kept >= 0
    return keep.astype(bool)
