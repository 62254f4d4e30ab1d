"""Example-training data pipeline.

Tries to load FashionMNIST from a local torchvision cache (the examples in
the reference train on FashionMNIST, examples/autoencoder.py:79-83); in
zero-egress environments it falls back to a synthetic structured dataset
(mixtures of oriented gaussian blobs) with the same shape/normalization, so
every example script runs anywhere.
"""

from __future__ import annotations

import numpy as np


def _try_fashion_mnist():
    try:
        from torchvision import datasets, transforms  # type: ignore
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
    images = np.zeros((num, size, size), np.float32)
    for i in range(num):
        for _ in range(rng.integers(2, 5)):
            cx, cy = rng.uniform(4, size - 4, 2)
            sx, sy = rng.uniform(1.5, 5.0, 2)
            theta = rng.uniform(0, np.pi)
            dx, dy = xs - cx, ys - cy
            rx = dx * np.cos(theta) + dy * np.sin(theta)
            ry = -dx * np.sin(theta) + dy * np.cos(theta)
            images[i] += np.exp(-(rx ** 2 / (2 * sx ** 2) + ry ** 2 / (2 * sy ** 2)))
    images = np.clip(images, 0.0, 1.0)
    return images * 2.0 - 1.0


def image_batches(batch_size: int = 256, seed: int = 0, channel_last: bool = True):
    """Infinite iterator of (batch_size, 28, 28, 1) float32 batches in
    [-1, 1]. FashionMNIST when locally available, synthetic otherwise."""
    data = _try_fashion_mnist()
    if data is None:
        data = _synthetic_images(seed=seed)

    rng = np.random.default_rng(seed)
    n = data.shape[0]
    while True:
        idx = rng.integers(0, n, batch_size)
        batch = data[idx][..., None]                     # (b, h, w, 1)
        if not channel_last:
            batch = np.moveaxis(batch, -1, 1)
        yield batch.astype(np.float32)
