"""Native host-side ops: C++ pairwise IoU loaded via ctypes.

The reference ships exactly one first-party native component — the Cython
pairwise-IoU `compute_overlap.pyx` (SURVEY.md §2.3). tdnet's equivalent is
an ~50-LoC C++ shared library (compute_overlap.cpp) built lazily with g++
(no pybind11 in this image; ctypes binding instead). A numpy broadcast
fallback keeps everything working when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "compute_overlap.cpp")
_SO = os.path.join(_HERE, "_compute_overlap.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without -march=native / openmp for maximal portability
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120,
            )
            return True
        except Exception:
            return False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.compute_overlap.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.compute_overlap.restype = None
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def _compute_overlap_np(boxes: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Numpy fallback with identical semantics (legacy +1 convention)."""
    b = boxes[:, None, :]
    q = queries[None, :, :]
    iw = np.minimum(b[..., 2], q[..., 2]) - np.maximum(b[..., 0], q[..., 0]) + 1.0
    ih = np.minimum(b[..., 3], q[..., 3]) - np.maximum(b[..., 1], q[..., 1]) + 1.0
    iw = np.maximum(iw, 0.0)
    ih = np.maximum(ih, 0.0)
    inter = iw * ih
    area_b = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    area_q = (queries[:, 2] - queries[:, 0] + 1.0) * (queries[:, 3] - queries[:, 1] + 1.0)
    union = area_b[:, None] + area_q[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(inter > 0, inter / union, 0.0)
    return out


def compute_overlap(boxes: np.ndarray, query_boxes: np.ndarray) -> np.ndarray:
    """Pairwise IoU [N,4] x [K,4] -> [N,K] float64 (legacy +1 convention).

    Drop-in equivalent of the reference's compute_overlap
    (keras_retinanet/utils/compute_overlap.pyx).
    """
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    query_boxes = np.ascontiguousarray(query_boxes, dtype=np.float64)
    n, k = boxes.shape[0], query_boxes.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k), dtype=np.float64)

    lib = _load()
    if lib is None:
        return _compute_overlap_np(boxes, query_boxes)

    out = np.empty((n, k), dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.compute_overlap(
        boxes.ctypes.data_as(dp), ctypes.c_int64(n),
        query_boxes.ctypes.data_as(dp), ctypes.c_int64(k),
        out.ctypes.data_as(dp),
    )
    return out
