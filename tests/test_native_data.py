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
