"""ctypes bindings for the native host geometry library.

The C++ library (core/native/geometry.cpp) provides the data-pipeline hot-path
kernels (point-in-rotated-box, BEV quad collision) plus exact rotated-IoU /
greedy-NMS oracles used by the tests to validate the on-device JAX kernels.

The library is built lazily with `make` on first use and cached; if the build
fails everything transparently falls back to the vectorized NumPy versions in
:mod:`pillarnext_tpu.core.box_ops`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpnx_geometry.so"

_lib = None
_build_failed = False


def _load() -> "ctypes.CDLL | None":
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"],
                cwd=_NATIVE_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.pnx_points_in_rbbox.argtypes = [f32p, i64, i64, f32p, i64, i64, u8p]
    lib.pnx_box_collision_test.argtypes = [f32p, i64, f32p, i64, u8p]
    lib.pnx_boxes_overlap_bev.argtypes = [f32p, i64, f32p, i64, f32p]
    lib.pnx_boxes_aligned_iou_bev.argtypes = [f32p, f32p, i64, f32p]
    lib.pnx_rotated_nms.argtypes = [f32p, i64, ctypes.c_float, i64p]
    lib.pnx_rotated_nms.restype = i64
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native library is loadable (building it if needed)."""
    if os.environ.get("PNX_DISABLE_NATIVE"):
        return False
    return _load() is not None


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N, M) bool: point i inside rotated 3-D box j (z = box center)."""
    lib = _load()
    points = np.ascontiguousarray(points, dtype=np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    n, m = points.shape[0], boxes.shape[0]
    out = np.zeros((n, m), dtype=np.uint8)
    if n and m:
        lib.pnx_points_in_rbbox(
            points, n, points.shape[1], boxes, m, boxes.shape[1], out
        )
    return out.astype(bool)


def box_collision_test(corners_a: np.ndarray, corners_b: np.ndarray) -> np.ndarray:
    """(N, K) bool BEV collision matrix from (.., 4, 2) corner quads."""
    lib = _load()
    a = np.ascontiguousarray(corners_a, dtype=np.float32)
    b = np.ascontiguousarray(corners_b, dtype=np.float32)
    n, k = a.shape[0], b.shape[0]
    out = np.zeros((n, k), dtype=np.uint8)
    if n and k:
        lib.pnx_box_collision_test(a, n, b, k, out)
    return out.astype(bool)


def boxes_overlap_bev(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Exact (N, M) BEV overlap areas of [x,y,z,dx,dy,dz,yaw] boxes (oracle)."""
    lib = _load()
    a = np.ascontiguousarray(boxes_a, dtype=np.float32)
    b = np.ascontiguousarray(boxes_b, dtype=np.float32)
    n, m = a.shape[0], b.shape[0]
    out = np.zeros((n, m), dtype=np.float32)
    if n and m:
        lib.pnx_boxes_overlap_bev(a, n, b, m, out)
    return out


def boxes_aligned_iou_bev(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Row-aligned exact BEV IoU (N,) (oracle)."""
    lib = _load()
    a = np.ascontiguousarray(boxes_a, dtype=np.float32)
    b = np.ascontiguousarray(boxes_b, dtype=np.float32)
    out = np.zeros((a.shape[0],), dtype=np.float32)
    if a.shape[0]:
        lib.pnx_boxes_aligned_iou_bev(a, b, a.shape[0], out)
    return out


def rotated_nms(boxes: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy rotated-BEV NMS over score-sorted (N, 7) boxes; returns kept
    row indices (oracle for the on-device NMS)."""
    lib = _load()
    b = np.ascontiguousarray(boxes, dtype=np.float32)
    keep = np.zeros((b.shape[0],), dtype=np.int64)
    cnt = lib.pnx_rotated_nms(b, b.shape[0], float(thresh), keep) if b.shape[0] else 0
    return keep[:cnt]
