"""ctypes bindings to the native C++ runtime components.

The shared library builds on first use (``make`` in this directory);
callers can also prebuild it.  Exposes:

* :func:`mesh_sdf` — batch signed distance of points to a mesh (OpenMP).
* :func:`bake_sdf` — mesh -> cubic SDF grid, same layout as
  ``geom.sdf.bake_sdf`` (the SDFGen analog, ``make_sdf.py:30-36``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.realpath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcatgrasp_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        proc = subprocess.run(["make", "-C", _DIR], capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed (rc={proc.returncode}):\n{proc.stderr}"
            )
    _lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    _lib.mesh_sdf.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int,
                              f32p, ctypes.c_int, f32p]
    _lib.bake_sdf.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float, f32p, f32p, f32p]
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def mesh_sdf(vertices: np.ndarray, faces: np.ndarray, pts: np.ndarray) -> np.ndarray:
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    p = np.ascontiguousarray(pts, np.float32)
    out = np.empty(len(p), np.float32)
    lib.mesh_sdf(v, len(v), f, len(f), p, len(p), out)
    return out


def bake_sdf(vertices: np.ndarray, faces: np.ndarray, dims: int = 48,
             padding: float = 0.004):
    """Returns (values (dims,dims,dims), lower (3,), spacing float)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    values = np.empty((dims, dims, dims), np.float32)
    lower = np.empty(3, np.float32)
    spacing = np.empty(1, np.float32)
    lib.bake_sdf(v, len(v), f, len(f), dims, padding,
                 values.reshape(-1), lower, spacing)
    return values, lower, float(spacing[0])
