"""ctypes bindings for the native C++ runtime components (native/).

Gracefully degrades: `available()` is False when libcvo_native.so hasn't
been built (`make -C native`), and callers fall back to the OpenCV/NumPy
paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libcvo_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cvo_sgm_disparity.restype = ctypes.c_int
    lib.cvo_sgm_disparity.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.cvo_voxel_downsample.restype = ctypes.c_int
    lib.cvo_voxel_downsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def build(verbose: bool = False) -> bool:
    """Compile the native library in place. Returns success."""
    try:
        out = subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            capture_output=not verbose, check=True,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def available() -> bool:
    return _load() is not None


def sgm_disparity(left: np.ndarray, right: np.ndarray, max_disp: int = 128,
                  p1: int = 10, p2: int = 120, uniqueness: float = 0.1):
    """Census/SGM left disparity [H,W] float32 (<=0 invalid), native C++."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libcvo_native.so not built (run `make -C native`)")
    left = np.ascontiguousarray(left, np.uint8)
    right = np.ascontiguousarray(right, np.uint8)
    assert left.shape == right.shape and left.ndim == 2
    h, w = left.shape
    out = np.empty((h, w), np.float32)
    rc = lib.cvo_sgm_disparity(
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, max_disp, p1, p2, ctypes.c_float(uniqueness),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"cvo_sgm_disparity failed: {rc}")
    return out


def voxel_downsample_indices(xyz: np.ndarray, voxel: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("libcvo_native.so not built (run `make -C native`)")
    xyz = np.ascontiguousarray(xyz, np.float32).reshape(-1, 3)
    out = np.empty(len(xyz), np.int32)
    n = lib.cvo_voxel_downsample(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(xyz),
        ctypes.c_float(voxel), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:n]
