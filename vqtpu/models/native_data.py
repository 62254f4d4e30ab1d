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


class PrefetchLoader:
    """Background-thread prefetch ring over `IdxDataset.gather`.

    The C gather (native/vqdata.c) releases the GIL for the duration of the
    ctypes call, so batch preparation genuinely overlaps device compute /
    host-to-device transfer of the previous step. Each slot is a FRESH
    buffer (never reused), so async JAX dispatch can hold zero-copy views
    safely (see models/data.py aliasing note).

    Iterate forever: `for batch in PrefetchLoader(ds, 256): ...` yields
    (b, rows, cols, 1) float32 in [-1, 1].
    """

    def __init__(
        self,
        dataset: IdxDataset,
        batch_size: int,
        seed: int = 0,
        depth: int = 3,
        channel_last: bool = True,
    ):
        import queue
        import threading

        self._ds = dataset
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._channel_last = channel_last

        import queue as _queue

        self._error = None

        def worker():
            rng = np.random.default_rng(seed)
            while not self._stop.is_set():
                idx = rng.integers(0, dataset.count, batch_size)
                out = np.empty(
                    (batch_size, dataset.rows, dataset.cols), np.float32
                )
                try:
                    dataset.gather(idx, out)    # GIL released inside C
                except Exception as e:          # dataset closed / bad file —
                    self._error = e             # surface it to the consumer
                    return
                batch = out[..., None]
                if not channel_last:
                    batch = np.moveaxis(batch, -1, 1)
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.25)
                        break
                    except _queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        import queue as _queue

        # poll with a timeout so a dead worker raises instead of hanging
        while True:
            try:
                return self._q.get(timeout=1.0)
            except _queue.Empty:
                if self._error is not None:
                    raise RuntimeError(
                        'prefetch worker died'
                    ) from self._error
                if not self._thread.is_alive():
                    raise StopIteration

    def close(self):
        """Stop and JOIN the worker before the caller may close the
        underlying dataset (the mmap must outlive any in-flight gather)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5.0)

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
