"""ctypes bridge to the native OBJ parser (scene/cpp/obj_loader.cpp).

Same pattern as accel/native.py: compiled with g++ on first use, silent
fallback to the pure-Python parser (scene/obj_loader.py) when no compiler is
available. The Python parser measures ~6 MB/s; the native one is ~2 orders
of magnitude faster, which matters at the reference's 64M-prim scene cap
(src/impl/scene.cu:1084-1091 — its loader is tinyobjloader, also native).
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

_SRC = os.path.join(os.path.dirname(__file__), "cpp", "obj_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "cpp", "libobj.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=180,
                )
            lib = ctypes.CDLL(_SO)
            lib.obj_parse.restype = ctypes.c_void_p
            lib.obj_parse.argtypes = [ctypes.c_char_p]
            lib.obj_num_tris.restype = ctypes.c_int64
            lib.obj_num_tris.argtypes = [ctypes.c_void_p]
            lib.obj_fill.restype = None
            lib.obj_fill.argtypes = [ctypes.c_void_p] + [
                ctypes.POINTER(ctypes.c_float)] * 3
            lib.obj_free.restype = None
            lib.obj_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def load_obj_native(path: str):
    """Native load_obj: dict {p (T,3,3), n (T,3,3), uv (T,3,2)} float32,
    or None when the native library is unavailable or parsing fails."""
    lib = _load()
    if lib is None:
        return None
    h = lib.obj_parse(os.fsencode(path))
    if not h:
        return None
    try:
        T = int(lib.obj_num_tris(h))
        p = np.zeros((T, 3, 3), np.float32)
        n = np.zeros((T, 3, 3), np.float32)
        uv = np.zeros((T, 3, 2), np.float32)
        if T:
            fp = ctypes.POINTER(ctypes.c_float)
            lib.obj_fill(h, p.ctypes.data_as(fp), n.ctypes.data_as(fp),
                         uv.ctypes.data_as(fp))
        return {"p": p, "n": n, "uv": uv}
    finally:
        lib.obj_free(h)
