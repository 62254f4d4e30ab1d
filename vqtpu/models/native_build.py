"""Build + load the native data runtime (native/vqdata.c) via ctypes.

Compiled once with the system cc into a per-repo cache; all failures
degrade silently to the pure-numpy path (native_data.load() returns None).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'vqdata.c')
_OUT_DIR = os.path.join(_REPO_ROOT, 'native', 'build')
_OUT = os.path.join(_OUT_DIR, 'libvqdata.so')


def compile_lib(src: str, out: str) -> str | None:
    """Compile one C source into a shared library (cached on mtime)."""
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    for cc in ('cc', 'gcc', 'clang'):
        try:
            subprocess.run(
                [cc, '-O3', '-shared', '-fPIC', '-o', out, src],
                check=True, capture_output=True, timeout=120,
            )
            return out
        except (FileNotFoundError, subprocess.SubprocessError):
            continue
    return None


def _compile() -> str | None:
    return compile_lib(_SRC, _OUT)


_lib = None


def load() -> ctypes.CDLL | None:
    """The loaded library with typed signatures, or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    path = _compile()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.vq_idx_open.argtypes = [ctypes.c_char_p]
    lib.vq_idx_open.restype = ctypes.c_void_p
    lib.vq_idx_close.argtypes = [ctypes.c_void_p]
    lib.vq_idx_close.restype = None
    for fn in ('vq_idx_count', 'vq_idx_rows', 'vq_idx_cols'):
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
        getattr(lib, fn).restype = ctypes.c_int64
    lib.vq_idx_gather_f32.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vq_idx_gather_f32.restype = ctypes.c_int
    _lib = lib
    return _lib
