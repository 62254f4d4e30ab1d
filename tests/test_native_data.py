"""Native IDX data runtime (native/vqdata.c via ctypes): build, load,
gather+normalize parity against a numpy reference, and error handling."""

import os
import tempfile

import numpy as np
import pytest

from vqtpu.models import native_build, native_data


@pytest.fixture(scope='module')
def lib():
    lib = native_build.load()
    if lib is None:
        pytest.skip('no C toolchain available to build the native runtime')
    return lib


def _make_idx(tmpdir, n=64, rows=28, cols=28, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, rows, cols), dtype=np.uint8)
    path = os.path.join(tmpdir, 'train-images-idx3-ubyte')
    native_data.write_idx(path, images)
    return path, images


def test_native_gather_matches_numpy(lib):
    with tempfile.TemporaryDirectory() as td:
        path, images = _make_idx(td)
        ds = native_data.IdxDataset(path)
        assert (ds.count, ds.rows, ds.cols) == images.shape

        idx = np.array([0, 5, 63, 5, 17], np.int64)
        got = ds.gather(idx)
        want = images[idx].astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.min() >= -1.0 and got.max() <= 1.0
        ds.close()


def test_native_gather_reuses_buffer(lib):
    with tempfile.TemporaryDirectory() as td:
        path, images = _make_idx(td, n=16)
        ds = native_data.IdxDataset(path)
        out = np.empty((4, 28, 28), np.float32)
        got = ds.gather(np.arange(4, dtype=np.int64), out)
        assert got is out
        ds.close()


def test_native_gather_bad_index(lib):
    with tempfile.TemporaryDirectory() as td:
        path, _ = _make_idx(td, n=8)
        ds = native_data.IdxDataset(path)
        with pytest.raises(IndexError):
            ds.gather(np.array([8], np.int64))
        ds.close()


def test_native_rejects_garbage(lib):
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, 'junk')
        with open(path, 'wb') as f:
            f.write(b'not an idx file at all, definitely')
        with pytest.raises(FileNotFoundError):
            native_data.IdxDataset(path)


def test_image_batches_uses_native_when_idx_present(lib, monkeypatch):
    from vqtpu.models import data as data_mod

    with tempfile.TemporaryDirectory() as td:
        path, images = _make_idx(td, n=32)
        monkeypatch.setattr(data_mod, '_IDX_CANDIDATES', (path,))
        gen = data_mod.image_batches(batch_size=8, seed=0)
        batch = next(gen)
        assert batch.shape == (8, 28, 28, 1) and batch.dtype == np.float32
        assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_prefetch_loader_ring(tmp_path):
    """The background prefetch ring yields correct batches with fresh
    buffers (no aliasing between consecutive batches)."""
    import numpy as np
    from vqtpu.models.native_data import IdxDataset, PrefetchLoader, write_idx

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(64, 8, 8), dtype=np.uint8)
    path = str(tmp_path / 'imgs-idx3-ubyte')
    write_idx(path, images)

    ds = IdxDataset(path)
    loader = PrefetchLoader(ds, batch_size=16, seed=3, depth=2)
    b1 = next(loader)
    b2 = next(loader)
    assert b1.shape == (16, 8, 8, 1) and b1.dtype == np.float32
    assert b1.min() >= -1.0 and b1.max() <= 1.0
    # fresh buffers: mutating one batch must not affect the other
    assert b1.base is not b2.base or b1.base is None
    v = b2.copy()
    b1[:] = 0
    assert (b2 == v).all()
    # values really come from the file (same normalization as the C kernel)
    lut = np.arange(256, dtype=np.float32) * (2.0 / 255.0) - 1.0
    rng2 = np.random.default_rng(3)
    idx = rng2.integers(0, 64, 16)
    want = lut[images[idx]][..., None]
    loader2 = PrefetchLoader(ds, batch_size=16, seed=3, depth=2)
    b_fresh = next(loader2)
    assert np.array_equal(b_fresh, want)
    # close() joins the worker BEFORE the dataset (mmap) goes away
    loader.close()
    loader2.close()
    ds.close()


def test_import_fashion_mnist_hand_carry(tmp_path, lib):
    """The offline bring-your-own-data path (tools/import_fashion_mnist.py):
    every accepted hand-carry format — .npy (uint8 / [0,1] float / [-1,1]
    float), .npz, raw IDX, gzipped IDX, and a torchvision-style raw dir —
    must import into the native loader's location and feed image_batches
    with the real rows (reference data contract:
    examples/autoencoder.py:62-70)."""
    import gzip
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))
    import import_fashion_mnist as imp

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(24, 28, 28), dtype=np.uint8)

    sources = {}
    p = str(tmp_path / 'imgs.npy'); np.save(p, images); sources['npy-u8'] = p
    p = str(tmp_path / 'imgs01.npy')
    np.save(p, images.astype(np.float32) / 255.0); sources['npy-01'] = p
    p = str(tmp_path / 'imgs11.npy')
    np.save(p, images.astype(np.float32) / 255.0 * 2 - 1); sources['npy-11'] = p
    p = str(tmp_path / 'imgs.npz')
    np.savez(p, x_train=images); sources['npz'] = p
    rawdir = tmp_path / 'FashionMNIST_raw'; rawdir.mkdir()
    idx_path = str(rawdir / 'train-images-idx3-ubyte')
    native_data.write_idx(idx_path, images)
    sources['idx'] = idx_path
    gz_path = idx_path + '.gz'
    with open(idx_path, 'rb') as f, gzip.open(gz_path, 'wb') as g:
        g.write(f.read())
    sources['dir'] = str(rawdir)

    for name, src in sources.items():
        root = tmp_path / f'root_{name}'
        dst = imp.import_images(src, str(root))
        ds = native_data.IdxDataset(dst)
        assert ds.count == 24, name
        got = ds.gather(np.arange(24, dtype=np.int64))
        want = (images.astype(np.float32) / 255.0 - 0.5) / 0.5
        # float sources lose <1/255 in the u8 round-trip
        np.testing.assert_allclose(got, want, atol=1.5 / 255, err_msg=name)

    # and the examples' data pipeline picks it up
    from vqtpu.models import data as data_mod
    dst = imp.import_images(sources['npy-u8'], str(tmp_path / 'root_pipe'))
    orig = data_mod._IDX_CANDIDATES
    try:
        data_mod._IDX_CANDIDATES = (dst,)
        batch = next(data_mod.image_batches(batch_size=4, seed=0))
        assert batch.shape == (4, 28, 28, 1)
    finally:
        data_mod._IDX_CANDIDATES = orig
