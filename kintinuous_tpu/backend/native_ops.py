"""ctypes bindings for the native backend cloud ops (native/cloud_ops.cpp).

The reference's backend is C++ throughout (PCL VoxelGrid +
NormalEstimation, CloudSliceProcessor.cpp:119-151); these bindings give
the TPU build's host backend the same native runtime for its slice
hot path. Falls back gracefully when the library isn't built — the
numpy/scipy implementations in slice_proc.py stay authoritative for
tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    path = os.path.join(root, "native", "libcloud_ops.so")
    if not os.path.exists(path):
        try:  # build on first use (g++ is part of the toolchain)
            subprocess.run(
                ["make", "-C", os.path.join(root, "native"),
                 "libcloud_ops.so"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.cloud_voxel_downsample.restype = ctypes.c_int
    lib.cloud_voxel_downsample.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.cloud_estimate_normals.restype = None
    lib.cloud_estimate_normals.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def voxel_downsample(
    points: np.ndarray,
    colors: Optional[np.ndarray],
    weights: Optional[np.ndarray],
    leaf: float,
) -> Optional[Tuple]:
    lib = _find_lib()
    if lib is None or len(points) == 0:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    cols = (
        np.ascontiguousarray(colors, np.uint8) if colors is not None else None
    )
    wgts = (
        np.ascontiguousarray(weights, np.float32)
        if weights is not None else None
    )
    out_p = np.empty((n, 3), np.float32)
    out_c = np.empty((n, 3), np.uint8) if cols is not None else None
    out_w = np.empty((n,), np.float32) if wgts is not None else None

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    m = lib.cloud_voxel_downsample(
        ptr(pts), ptr(cols), ptr(wgts), n, ctypes.c_float(leaf),
        ptr(out_p), ptr(out_c), ptr(out_w),
    )
    return (
        out_p[:m].copy(),
        out_c[:m].copy() if out_c is not None else None,
        out_w[:m].copy() if out_w is not None else None,
    )


def estimate_normals(
    points: np.ndarray,
    k: int,
    cell: float,
    viewpoint: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    lib = _find_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    out = np.empty((n, 3), np.float32)
    if n == 0:
        return out
    vp = (
        np.ascontiguousarray(viewpoint, np.float32)
        if viewpoint is not None else None
    )
    lib.cloud_estimate_normals(
        pts.ctypes.data_as(ctypes.c_void_p), n, k, ctypes.c_float(cell),
        vp.ctypes.data_as(ctypes.c_void_p) if vp is not None else None,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
