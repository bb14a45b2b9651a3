"""Native host library loader (ctypes; built on demand with g++).

The shared library is compiled once into the package directory (falling back
to a per-user cache dir when the package is read-only) and loaded via
ctypes — no pybind11/setuptools dependency. All entry points degrade
gracefully: callers fall back to the pure-Python/JAX implementations when
no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "deblurgs_native.cpp")
_LIB_NAME = "libdeblurgs_native.so"
_lib = None
_tried = False


def _build(out_path: str) -> bool:
    gxx = shutil.which("g++") or shutil.which("clang++")
    if gxx is None:
        return False
    for extra in (["-fopenmp"], []):
        cmd = [gxx, "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", out_path, _SRC] + extra
        try:
            res = subprocess.run(cmd, capture_output=True, timeout=120)
            if res.returncode == 0:
                return True
        except Exception:
            pass
    return False


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    candidates = [
        os.path.join(os.path.dirname(__file__), _LIB_NAME),
        os.path.join(tempfile.gettempdir(), f"deblurgs_native_{os.getuid()}",
                     _LIB_NAME),
    ]
    for path in candidates:
        if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(_SRC):
            try:
                _lib = _bind(ctypes.CDLL(path))
                return _lib
            except OSError:
                continue
    for path in candidates:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if os.access(os.path.dirname(path), os.W_OK) and _build(path):
            _lib = _bind(ctypes.CDLL(path))
            return _lib
    return None


def _bind(lib):
    lib.knn3_mean_sq.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.knn3_mean_sq.restype = None
    lib.parse_points3d_bin.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.parse_points3d_bin.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return load() is not None


def knn3_mean_sq(points: np.ndarray) -> np.ndarray | None:
    """Exact mean squared 3-NN distance on the host; None if unavailable."""
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(pts.shape[0], dtype=np.float32)
    lib.knn3_mean_sq(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def parse_points3d_bin(path: str):
    """COLMAP points3D.bin -> (xyz, rgb, err) or None if unavailable."""
    lib = load()
    if lib is None:
        return None
    buf = np.fromfile(path, dtype=np.uint8)
    if buf.size < 8:
        return None
    num = int(np.frombuffer(buf[:8].tobytes(), dtype=np.uint64)[0])
    xyz = np.empty((num, 3), np.float64)
    rgb = np.empty((num, 3), np.uint8)
    err = np.empty((num, 1), np.float64)
    n = lib.parse_points3d_bin(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(num),
    )
    if n < 0:
        return None
    return xyz[:n], rgb[:n], err[:n]
