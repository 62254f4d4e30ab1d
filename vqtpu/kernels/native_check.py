"""Independent native (C) oracle for nearest-code selection, used to
parity-fuzz the TPU kernels.

`nearest_code_ref` runs native/vqcheck.c: direct |x - e|^2 accumulated in
double with first-index tie-break — no squared-expansion algebra, no jax,
no shared code with the kernels it checks (vqtpu/kernels/distance.py).
Returns None-safe: callers should skip when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..models import native_build

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'vqcheck.c')
_OUT = os.path.join(_REPO_ROOT, 'native', 'build', 'libvqcheck.so')

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = native_build.compile_lib(_SRC, _OUT)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.vq_nearest_ref_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vq_nearest_ref_f32.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def nearest_code_ref(
    x: np.ndarray, embed: np.ndarray, metric: str = 'euclidean'
) -> np.ndarray:
    """(n, d), (c, d) float32 -> (n,) int32 via the native double-precision
    oracle. Raises RuntimeError when the native toolchain is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native vqcheck unavailable')
    x = np.ascontiguousarray(x, np.float32)
    embed = np.ascontiguousarray(embed, np.float32)
    n, d = x.shape
    c = embed.shape[0]
    out = np.empty((n,), np.int32)
    lib.vq_nearest_ref_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        embed.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, c, d, 1 if metric == 'cosine' else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
