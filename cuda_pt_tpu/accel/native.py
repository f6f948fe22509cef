"""ctypes bridge to the native C++ BVH builder (accel/cpp/bvh_builder.cpp).

Compiled on first use with g++ (no pybind11 in this environment — C ABI +
ctypes instead). Falls back silently to the NumPy builder when a compiler is
unavailable; callers use accel.bvh_build.build_bvh which dispatches here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "cpp", "bvh_builder.cpp")
_SO = os.path.join(os.path.dirname(__file__), "cpp", "libbvh.so")
_SRC_SBVH = os.path.join(os.path.dirname(__file__), "cpp", "sbvh_builder.cpp")
_SO_SBVH = os.path.join(os.path.dirname(__file__), "cpp", "libsbvh.so")

_LIB_SBVH = None
_TRIED_SBVH = False


def _compile(src, so, extra=()):
    if (not os.path.exists(so)) or (os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             *extra, "-o", so, src],
            check=True, capture_output=True, timeout=180,
        )
    return ctypes.CDLL(so)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = _compile(_SRC, _SO)
            lib.bvh_build.restype = ctypes.c_int64
            lib.bvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # lo
                ctypes.POINTER(ctypes.c_float),  # hi
                ctypes.POINTER(ctypes.c_float),  # cent
                ctypes.c_int64,                  # n
                ctypes.c_int32,                  # max_leaf
                ctypes.c_float,                  # overlap_w
                ctypes.POINTER(ctypes.c_float),  # out_min
                ctypes.POINTER(ctypes.c_float),  # out_max
                ctypes.POINTER(ctypes.c_int32),  # out_skip
                ctypes.POINTER(ctypes.c_int32),  # out_base
                ctypes.POINTER(ctypes.c_int32),  # out_count
                ctypes.POINTER(ctypes.c_int64),  # out_order
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def _load_sbvh():
    global _LIB_SBVH, _TRIED_SBVH
    with _LOCK:
        if _TRIED_SBVH:
            return _LIB_SBVH
        _TRIED_SBVH = True
        try:
            lib = _compile(_SRC_SBVH, _SO_SBVH, extra=("-pthread",))
            lib.sbvh_build.restype = ctypes.c_int64
            lib.sbvh_build.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # p0
                ctypes.POINTER(ctypes.c_float),   # e1
                ctypes.POINTER(ctypes.c_float),   # e2
                ctypes.POINTER(ctypes.c_uint8),   # is_sphere
                ctypes.c_int64,                   # n
                ctypes.c_int32,                   # max_leaf
                ctypes.c_float,                   # overlap_w
                ctypes.c_float,                   # dup_budget_frac
                ctypes.POINTER(ctypes.c_float),   # out_min
                ctypes.POINTER(ctypes.c_float),   # out_max
                ctypes.POINTER(ctypes.c_int32),   # out_skip
                ctypes.POINTER(ctypes.c_int32),   # out_base
                ctypes.POINTER(ctypes.c_int32),   # out_count
                ctypes.POINTER(ctypes.c_int64),   # out_order
                ctypes.POINTER(ctypes.c_int64),   # out_m
            ]
            _LIB_SBVH = lib
        except Exception:
            _LIB_SBVH = None
        return _LIB_SBVH


def available() -> bool:
    return _load() is not None


def build_bvh_native(lo: np.ndarray, hi: np.ndarray, cent: np.ndarray,
                     max_leaf: int = 4, overlap_w: float = 1.0):
    """Native counterpart of bvh_build.build_bvh; returns the same dict or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lo.shape[0]
    if n == 0:
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    cent = np.ascontiguousarray(cent, np.float32)
    cap = 2 * n + 8
    out_min = np.empty((cap, 3), np.float32)
    out_max = np.empty((cap, 3), np.float32)
    out_skip = np.empty(cap, np.int32)
    out_base = np.empty(cap, np.int32)
    out_count = np.empty(cap, np.int32)
    out_order = np.empty(n, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    m = lib.bvh_build(
        p(lo, ctypes.c_float), p(hi, ctypes.c_float), p(cent, ctypes.c_float),
        ctypes.c_int64(n), ctypes.c_int32(max_leaf), ctypes.c_float(overlap_w),
        p(out_min, ctypes.c_float), p(out_max, ctypes.c_float),
        p(out_skip, ctypes.c_int32), p(out_base, ctypes.c_int32),
        p(out_count, ctypes.c_int32), p(out_order, ctypes.c_int64),
    )
    if m <= 0:
        return None
    return {
        "node_min": out_min[:m].copy(),
        "node_max": out_max[:m].copy(),
        "node_skip": out_skip[:m].copy(),
        "node_base": out_base[:m].copy(),
        "node_count": out_count[:m].copy(),
        "order": out_order.copy(),
    }


def sbvh_available() -> bool:
    return _load_sbvh() is not None


def build_sbvh_native(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                      is_sphere: np.ndarray, max_leaf: int = 4,
                      overlap_w: float = 1.0, dup_budget_frac: float = 0.5):
    """Spatial-split BVH (accel/cpp/sbvh_builder.cpp).

    Returns the bvh_build dict, where ``order`` (n_out >= n, with duplicate
    original prim ids) maps output slot -> original prim. None on failure.
    """
    lib = _load_sbvh()
    if lib is None:
        return None
    n = p0.shape[0]
    if n == 0:
        return None
    p0 = np.ascontiguousarray(p0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    sph = np.ascontiguousarray(is_sphere, np.uint8)
    ncap = 4 * n + 8
    out_min = np.empty((ncap, 3), np.float32)
    out_max = np.empty((ncap, 3), np.float32)
    out_skip = np.empty(ncap, np.int32)
    out_base = np.empty(ncap, np.int32)
    out_count = np.empty(ncap, np.int32)
    out_order = np.empty(3 * n, np.int64)
    out_m = np.zeros(1, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n_out = lib.sbvh_build(
        p(p0, ctypes.c_float), p(e1, ctypes.c_float), p(e2, ctypes.c_float),
        p(sph, ctypes.c_uint8), ctypes.c_int64(n), ctypes.c_int32(max_leaf),
        ctypes.c_float(overlap_w), ctypes.c_float(dup_budget_frac),
        p(out_min, ctypes.c_float), p(out_max, ctypes.c_float),
        p(out_skip, ctypes.c_int32), p(out_base, ctypes.c_int32),
        p(out_count, ctypes.c_int32), p(out_order, ctypes.c_int64),
        p(out_m, ctypes.c_int64),
    )
    if n_out <= 0:
        return None
    m = int(out_m[0])
    return {
        "node_min": out_min[:m].copy(),
        "node_max": out_max[:m].copy(),
        "node_skip": out_skip[:m].copy(),
        "node_base": out_base[:m].copy(),
        "node_count": out_count[:m].copy(),
        "order": out_order[:n_out].copy(),
    }
