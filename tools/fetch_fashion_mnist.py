"""Download FashionMNIST into the location vqtpu's data loaders expect.

The examples train on real FashionMNIST when it is present locally
(vqtpu/models/data.py probes ~/data/fashion_mnist first, mmap'd by the
native IDX loader) and fall back to synthetic data with a loud warning
otherwise. This vendored fetcher fills the cache in environments with
network access:

    python tools/fetch_fashion_mnist.py [--root ~/data/fashion_mnist]

Mirrors the reference's torchvision download (examples/autoencoder.py:79-83)
without the torchvision dependency.
"""

from __future__ import annotations

import argparse
import gzip
import os
import urllib.request

_BASE = 'https://storage.googleapis.com/tensorflow/tf-keras-datasets/'
_FILES = (
    'train-images-idx3-ubyte.gz',
    'train-labels-idx1-ubyte.gz',
    't10k-images-idx3-ubyte.gz',
    't10k-labels-idx1-ubyte.gz',
)


def fetch(root: str) -> None:
    raw = os.path.join(os.path.expanduser(root), 'FashionMNIST', 'raw')
    os.makedirs(raw, exist_ok=True)
    for name in _FILES:
        dst = os.path.join(raw, name[:-3])
        if os.path.exists(dst):
            print(f'exists: {dst}')
            continue
        url = _BASE + name
        print(f'fetching {url}')
        with urllib.request.urlopen(url, timeout=60) as r:
            blob = gzip.decompress(r.read())
        with open(dst, 'wb') as f:
            f.write(blob)
        print(f'wrote {dst} ({len(blob)} bytes)')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--root', default='~/data/fashion_mnist')
    a = p.parse_args()
    fetch(a.root)
