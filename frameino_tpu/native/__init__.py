"""Native (C++) host-side kernels with ctypes bindings.

Built from ``native/*.cpp`` via ``native/build.sh`` (g++ shared
library — no pybind11 in this image). Falls back transparently to the
pure-JAX implementations when the library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO, "native", "libframeino_native.so")
_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> str:
    """Compile the native library (g++ -O3 -march=native shared)."""
    src = os.path.join(_REPO, "native", "ms_deform_attn.cpp")
    if force or not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(src) > os.path.getmtime(_LIB_PATH):
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
             "-o", _LIB_PATH], check=True)
    return _LIB_PATH


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        path = build_native()
        lib = ctypes.CDLL(path)
        lib.ms_deform_attn_forward.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int64] * 7
        lib.ms_deform_attn_forward.restype = None
        _lib = lib
        return lib
    except Exception:
        return None


def ms_deform_attn_native(value: np.ndarray,
                          spatial_shapes: Sequence[Tuple[int, int]],
                          sampling_locations: np.ndarray,
                          attention_weights: np.ndarray) -> np.ndarray:
    """C++ MSDeformAttn forward. Same contract as
    ``frameino_tpu.ops.ms_deform_attn.ms_deform_attn`` (numpy arrays)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable; use the JAX op")
    value = np.ascontiguousarray(value, np.float32)
    locs = np.ascontiguousarray(sampling_locations, np.float32)
    weights = np.ascontiguousarray(attention_weights, np.float32)
    shapes = np.ascontiguousarray(np.asarray(spatial_shapes, np.int64))
    B, S, H, D = value.shape
    Q, L, P = locs.shape[1], locs.shape[3], locs.shape[4]
    out = np.zeros((B, Q, H * D), np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ms_deform_attn_forward(
        ptr(value, ctypes.c_float), ptr(shapes, ctypes.c_int64),
        ptr(locs, ctypes.c_float), ptr(weights, ctypes.c_float),
        ptr(out, ctypes.c_float), B, S, H, D, Q, L, P)
    return out
