"""Migration path: import trained reference checkpoints into vqtpu and get
exactly the reference's outputs (extends the golden-parity suite to the
public import_torch_state API)."""

import importlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip('torch')
sys.modules.setdefault('einx', importlib.import_module('tests.einx_stub'))
if '/root/reference' not in sys.path:
    sys.path.insert(0, '/root/reference')
ref = pytest.importorskip('vector_quantize_pytorch')

import vqtpu
from vqtpu.utils import import_torch_state


def sd(module):
    return {k: np.array(v.detach().numpy()) for k, v in
            module.state_dict().items()}


def test_import_vq_with_projections():
    torch.manual_seed(0)
    rvq = ref.VectorQuantize(dim=16, codebook_size=32, codebook_dim=8)
    # "train" it a bit so the state is non-trivial
    for i in range(3):
        rvq(torch.randn(2, 10, 16))
    ovq = vqtpu.VectorQuantize(dim=16, codebook_size=32, codebook_dim=8,
                               rngs=nnx.Rngs(7))
    import_torch_state(ovq, sd(rvq))
    rvq.eval()
    ovq.eval()
    x = np.random.default_rng(1).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, _ = rvq(torch.from_numpy(x))
    oq, oi, _ = ovq(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()
    np.testing.assert_allclose(np.array(rq.detach().numpy()), np.asarray(oq),
                               atol=1e-5)


def test_import_residual_vq():
    torch.manual_seed(1)
    rr = ref.ResidualVQ(dim=16, num_quantizers=3, codebook_size=32)
    for i in range(2):
        rr(torch.randn(2, 10, 16))
    oo = vqtpu.ResidualVQ(dim=16, num_quantizers=3, codebook_size=32,
                          rngs=nnx.Rngs(9))
    import_torch_state(oo, sd(rr))
    rr.eval()
    oo.eval()
    x = np.random.default_rng(2).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, _ = rr(torch.from_numpy(x))
    oq, oi, _ = oo(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()
    np.testing.assert_allclose(np.array(rq.detach().numpy()), np.asarray(oq),
                               atol=1e-5)


def test_import_simvq():
    torch.manual_seed(2)
    rs = ref.SimVQ(dim=16, codebook_size=32)
    os_ = vqtpu.SimVQ(dim=16, codebook_size=32, rngs=nnx.Rngs(3))
    import_torch_state(os_, sd(rs))
    rs.eval()
    os_.eval()
    x = np.random.default_rng(3).standard_normal((2, 12, 16)).astype(np.float32)
    rq, ri, _ = rs(torch.from_numpy(x))
    oq, oi, _ = os_(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()


def test_import_latent_quantize():
    torch.manual_seed(3)
    rl = ref.LatentQuantize(levels=[5, 5, 8], dim=9)
    ol = vqtpu.LatentQuantize(levels=[5, 5, 8], dim=9, rngs=nnx.Rngs(5))
    import_torch_state(ol, sd(rl))
    rl.eval()
    ol.eval()
    x = np.random.default_rng(4).standard_normal((2, 9, 10)).astype(np.float32)
    rq, ri, _ = rl(torch.from_numpy(x))
    oq, oi, _ = ol(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()


def test_import_rpq():
    torch.manual_seed(4)
    rr = ref.RandomProjectionQuantizer(dim=16, codebook_size=32,
                                       codebook_dim=8, num_codebooks=2)
    oo = vqtpu.RandomProjectionQuantizer(dim=16, codebook_size=32,
                                         codebook_dim=8, num_codebooks=2,
                                         rngs=nnx.Rngs(6))
    import_torch_state(oo, sd(rr))
    x = np.random.default_rng(5).standard_normal((2, 10, 16)).astype(np.float32)
    ri = rr(torch.from_numpy(x))
    oi = oo(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()


def test_import_hierarchical_vq():
    torch.manual_seed(5)
    kw = dict(dim=8, codebook_size=16, scales=(1, 2, 4), kmeans_init=False,
              threshold_ema_dead_code=0, accept_image_fmap=True)
    rh = ref.HierarchicalVQ(**kw)
    oh = vqtpu.HierarchicalVQ(rngs=nnx.Rngs(8), **kw)
    import_torch_state(oh, sd(rh))
    rh.eval()
    oh.eval()
    fmap = np.random.default_rng(6).standard_normal((2, 8, 4, 4)).astype(np.float32)
    r_out = rh(torch.from_numpy(fmap))
    o_out = oh(jnp.asarray(fmap))
    for ri, oi in zip(r_out[1], o_out[1]):
        assert (np.array(ri.numpy()) == np.asarray(oi)).all()


def test_import_fsq_lfq_projections():
    torch.manual_seed(6)
    rf = ref.FSQ(levels=[8, 5, 5], dim=16)
    of = vqtpu.FSQ(levels=[8, 5, 5], dim=16, rngs=nnx.Rngs(1))
    import_torch_state(of, sd(rf))
    rf.eval()
    of.eval()
    x = np.random.default_rng(7).standard_normal((2, 10, 16)).astype(np.float32)
    rq, ri = rf(torch.from_numpy(x))
    oq, oi = of(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()
    np.testing.assert_allclose(np.array(rq.detach().numpy()), np.asarray(oq),
                               atol=1e-5)

    rl = ref.LFQ(codebook_size=2 ** 4, dim=16)
    ol = vqtpu.LFQ(codebook_size=2 ** 4, dim=16, rngs=nnx.Rngs(2))
    import_torch_state(ol, sd(rl))
    rl.eval()
    ol.eval()
    rq, ri, _ = rl(torch.from_numpy(x))
    oq, oi, _ = ol(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()


def test_import_qinco_residual_vq():
    torch.manual_seed(7)
    kw = dict(dim=8, num_quantizers=3, codebook_size=16,
              implicit_neural_codebook=True, mlp_kwargs=dict(depth=2))
    rr = ref.ResidualVQ(**kw)
    oo = vqtpu.ResidualVQ(rngs=nnx.Rngs(11), **kw)
    import_torch_state(oo, sd(rr))
    rr.eval()
    oo.eval()
    x = np.random.default_rng(8).standard_normal((2, 6, 8)).astype(np.float32)
    rq, ri, _ = rr(torch.from_numpy(x))
    oq, oi, _ = oo(jnp.asarray(x))
    assert (np.array(ri.numpy()) == np.asarray(oi)).all()
    np.testing.assert_allclose(np.array(rq.detach().numpy()), np.asarray(oq),
                               atol=1e-4)
