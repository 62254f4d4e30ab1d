"""Offline FashionMNIST import: convert a hand-carried copy of the dataset
into the IDX file vqtpu's native loader mmaps.

The sandbox has zero egress, so `tools/fetch_fashion_mnist.py` cannot run
here — but the examples and quality-parity harnesses switch to real data
automatically the moment the IDX file exists (vqtpu/models/data.py probes
`~/data/fashion_mnist/FashionMNIST/raw/train-images-idx3-ubyte` first).
This tool closes the gap from ANY copy of the dataset you can carry in:

    python tools/import_fashion_mnist.py --src <source> [--root ~/data/fashion_mnist]

Accepted sources (auto-detected):
  * `train-images-idx3-ubyte` or `.gz`   — raw/gzipped IDX (the torchvision
    / keras cache format; reference examples/autoencoder.py:79-83)
  * a directory containing the above     — e.g. a whole torchvision
    `FashionMNIST/raw` cache copied from another machine
  * `.npy`                               — a (N, 28, 28) array (uint8 0-255,
    or float in [0, 1] / [-1, 1], which are rescaled)
  * `.npz`                               — ditto, first array found (keys
    like 'x_train' / 'images' preferred)

The import is validated by round-tripping a few rows through the native
loader before declaring success.
"""

from __future__ import annotations

import argparse
import gzip
import os
import sys

import numpy as np

_IDX_NAMES = ('train-images-idx3-ubyte', 'train-images-idx3-ubyte.gz')


def _to_uint8(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    assert arr.ndim == 3, f'expected (N, rows, cols), got {arr.shape}'
    if arr.dtype == np.uint8:
        return arr
    arr = arr.astype(np.float32)
    lo, hi = float(arr.min()), float(arr.max())
    if lo >= -1.0 - 1e-6 and lo < -1e-3:                 # [-1, 1]
        arr = (arr + 1.0) / 2.0
    elif hi > 1.5:                                       # already 0-255
        return np.clip(np.rint(arr), 0, 255).astype(np.uint8)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def _read_idx_bytes(blob: bytes) -> np.ndarray:
    assert int.from_bytes(blob[0:4], 'big') == 0x00000803, 'not an IDX3 file'
    n = int.from_bytes(blob[4:8], 'big')
    rows = int.from_bytes(blob[8:12], 'big')
    cols = int.from_bytes(blob[12:16], 'big')
    data = np.frombuffer(blob, np.uint8, count=n * rows * cols, offset=16)
    return data.reshape(n, rows, cols)


def load_source(src: str) -> np.ndarray:
    src = os.path.expanduser(src)
    if os.path.isdir(src):
        for name in _IDX_NAMES:
            cand = os.path.join(src, name)
            if os.path.exists(cand):
                return load_source(cand)
        raise FileNotFoundError(
            f'no {_IDX_NAMES[0]}[.gz] inside directory {src}'
        )
    if src.endswith('.npy'):
        return _to_uint8(np.load(src))
    if src.endswith('.npz'):
        with np.load(src) as z:
            for key in ('x_train', 'images', 'train_images', 'data'):
                if key in z:
                    return _to_uint8(z[key])
            return _to_uint8(z[z.files[0]])
    with open(src, 'rb') as f:
        blob = f.read()
    if src.endswith('.gz'):
        blob = gzip.decompress(blob)
    return _read_idx_bytes(blob)


def import_images(src: str, root: str = '~/data/fashion_mnist') -> str:
    """Convert `src` into the native loader's IDX location; returns the
    written path after validating it through the native loader (if built)."""
    from vqtpu.models.native_data import write_idx

    images = load_source(src)
    raw = os.path.join(os.path.expanduser(root), 'FashionMNIST', 'raw')
    os.makedirs(raw, exist_ok=True)
    dst = os.path.join(raw, 'train-images-idx3-ubyte')
    write_idx(dst, images)

    try:
        from vqtpu.models.native_data import IdxDataset

        ds = IdxDataset(dst)
        assert ds.count == images.shape[0]
        got = ds.gather(np.array([0, images.shape[0] - 1], np.int64))
        want = (images[[0, -1]].astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(got, want, atol=1e-6)
        print(f'validated via native loader: {ds.count} images '
              f'{ds.rows}x{ds.cols}')
    except RuntimeError:
        print('native runtime not built here; wrote IDX without '
              'loader validation', file=sys.stderr)
    return dst


if __name__ == '__main__':
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument('--src', required=True,
                   help='IDX[.gz] file, directory containing one, or .npy/.npz')
    p.add_argument('--root', default='~/data/fashion_mnist')
    args = p.parse_args()
    dst = import_images(args.src, args.root)
    print(f'wrote {dst} — examples and parity harnesses will now train on it')
