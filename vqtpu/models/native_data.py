"""Native IDX dataset loader (mmap + fused gather/normalize in C).

The reference's data path is torchvision's Python loader; here the example
training IO is a native runtime component (native/vqdata.c): the dataset
file is mmap'd once and batches are gathered + normalized to [-1, 1] in a
single C pass directly into a reusable float32 buffer. Falls back cleanly
to numpy when the toolchain or file is unavailable
(vqtpu/models/data.py handles the fallback).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import native_build


class IdxDataset:
    """mmap'd IDX (MNIST-format) image file with native batch gather."""

    def __init__(self, path: str):
        lib = native_build.load()
        if lib is None:
            raise RuntimeError('native vqdata runtime unavailable')
        handle = lib.vq_idx_open(path.encode())
        if not handle:
            raise FileNotFoundError(f'not a readable IDX image file: {path}')
        self._lib = lib
        self._handle = handle
        self.count = int(lib.vq_idx_count(handle))
        self.rows = int(lib.vq_idx_rows(handle))
        self.cols = int(lib.vq_idx_cols(handle))

    def gather(self, indices: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        """(b,) int indices -> (b, rows, cols) float32 in [-1, 1]."""
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        b = indices.shape[0]
        if out is None:
            out = np.empty((b, self.rows, self.cols), np.float32)
        assert out.shape == (b, self.rows, self.cols) and out.dtype == np.float32
        rc = self._lib.vq_idx_gather_f32(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IndexError('index out of range in native gather')
        return out

    def close(self):
        if self._handle:
            self._lib.vq_idx_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_idx(path: str, images: np.ndarray) -> None:
    """Write (n, rows, cols) uint8 images as an IDX file (for tests and for
    converting cached datasets into the native loader's format)."""
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, rows, cols = images.shape
    with open(path, 'wb') as f:
        f.write((0x00000803).to_bytes(4, 'big'))
        f.write(n.to_bytes(4, 'big'))
        f.write(rows.to_bytes(4, 'big'))
        f.write(cols.to_bytes(4, 'big'))
        f.write(images.tobytes())
