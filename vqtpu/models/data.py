"""Example-training data pipeline.

Priority order:
  1. native IDX loader (native/vqdata.c via ctypes): a local FashionMNIST/
     MNIST `train-images-idx3-ubyte` is mmap'd and batches are gathered +
     normalized in one C pass — the TPU-native runtime replacement for the
     reference's torchvision dependency (examples/autoencoder.py:79-83);
  2. a torchvision cache if present;
  3. zero-egress fallback: a synthetic structured dataset (mixtures of
     oriented gaussian blobs) with the same shape/normalization, so every
     example script runs anywhere.
"""

from __future__ import annotations

import os

import numpy as np

_IDX_CANDIDATES = (
    '~/data/fashion_mnist/FashionMNIST/raw/train-images-idx3-ubyte',
    '~/data/FashionMNIST/raw/train-images-idx3-ubyte',
    '/root/data/FashionMNIST/raw/train-images-idx3-ubyte',
    '~/data/MNIST/raw/train-images-idx3-ubyte',
)


def _try_native_idx():
    from . import native_data

    for cand in _IDX_CANDIDATES:
        path = os.path.expanduser(cand)
        if not os.path.exists(path):
            continue
        try:
            return native_data.IdxDataset(path)
        except Exception:
            continue
    return None


def _try_fashion_mnist():
    try:
        from torchvision import datasets  # type: ignore
        import os

        for root in ('~/data/fashion_mnist', '~/data', '/root/data'):
            root = os.path.expanduser(root)
            try:
                ds = datasets.FashionMNIST(root=root, train=True, download=False)
                data = ds.data.numpy().astype(np.float32) / 255.0
                return (data - 0.5) / 0.5                # normalize to [-1, 1]
            except Exception:
                continue
    except Exception:
        pass
    return None


def _synthetic_images(num: int = 8192, size: int = 28, seed: int = 0) -> np.ndarray:
    """Structured synthetic images: 2-4 oriented gaussian blobs per image,
    normalized to [-1, 1]. Enough structure for a VQ autoencoder to learn a
    meaningful codebook."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    # fully vectorized: 4 blob slots per image, extra slots masked out so
    # each image keeps 2-4 blobs (the original per-image loop took ~60s for
    # 8192 images; this runs in <1s)
    k = 4
    nblobs = rng.integers(2, 5, size=(num, 1))
    active = (np.arange(k)[None, :] < nblobs).astype(np.float32)  # (num, k)
    cx = rng.uniform(4, size - 4, (num, k)).astype(np.float32)
    cy = rng.uniform(4, size - 4, (num, k)).astype(np.float32)
    sx = rng.uniform(1.5, 5.0, (num, k)).astype(np.float32)
    sy = rng.uniform(1.5, 5.0, (num, k)).astype(np.float32)
    theta = rng.uniform(0, np.pi, (num, k)).astype(np.float32)
    cos_t, sin_t = np.cos(theta), np.sin(theta)

    # (num, k, size, size)
    dx = xs[None, None] - cx[..., None, None]
    dy = ys[None, None] - cy[..., None, None]
    rx = dx * cos_t[..., None, None] + dy * sin_t[..., None, None]
    ry = -dx * sin_t[..., None, None] + dy * cos_t[..., None, None]
    blobs = np.exp(-(rx ** 2 / (2 * sx[..., None, None] ** 2)
                     + ry ** 2 / (2 * sy[..., None, None] ** 2)))
    images = (blobs * active[..., None, None]).sum(axis=1)
    images = np.clip(images, 0.0, 1.0)
    return (images * 2.0 - 1.0).astype(np.float32)


def image_batches(batch_size: int = 256, seed: int = 0, channel_last: bool = True):
    """Infinite iterator of (batch_size, 28, 28, 1) float32 batches in
    [-1, 1]. FashionMNIST when locally available (native IDX loader first),
    synthetic otherwise."""
    rng = np.random.default_rng(seed)

    native = _try_native_idx()
    if native is not None:
        # background prefetch ring: the C gather releases the GIL, so batch
        # prep overlaps device compute; every slot is a fresh buffer (JAX
        # dispatch is async and jnp.asarray can be zero-copy on CPU)
        from .native_data import PrefetchLoader

        loader = PrefetchLoader(
            native, batch_size, seed=seed, channel_last=channel_last
        )
        yield from loader
        # the prefetch loader is an INFINITE stream: reaching here means the
        # worker died without recording an error. Falling through to another
        # source would silently change the training data distribution
        # mid-run (r2 advisor finding) — fail loudly instead.
        raise RuntimeError(
            'native IDX prefetch loader terminated unexpectedly '
            '(worker thread exited without an error); refusing to fall '
            'back to a different data source mid-iteration'
        )

    data = _try_fashion_mnist()
    if data is None:
        import sys

        print(
            '=' * 70 + '\n'
            'WARNING: no local FashionMNIST found — training on SYNTHETIC\n'
            'blob images. Results are NOT comparable to reference runs on\n'
            'real data. Fetch the dataset with:\n'
            '    python tools/fetch_fashion_mnist.py\n'
            '(requires network; writes the IDX file the native loader uses)\n'
            + '=' * 70,
            file=sys.stderr,
        )
        data = _synthetic_images(seed=seed)

    n = data.shape[0]
    while True:
        idx = rng.integers(0, n, batch_size)
        batch = data[idx][..., None]                     # (b, h, w, 1)
        if not channel_last:
            batch = np.moveaxis(batch, -1, 1)
        yield batch.astype(np.float32)
