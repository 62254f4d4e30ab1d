"""Group-axis (EP-style) parallel execution of the Grouped composites:
`parallel.group_parallel_forward` must reproduce the serial Python-loop
forward (outputs AND member state updates) with groups sharded over a
`group` mesh axis on the 8-device CPU mesh. Parity bar = the repo's TP
convention (tests/test_tp.py): indices/integer state EXACT, float outputs
and EMA state allclose to ~1e-6 (jit-vs-eager fusion reorders float
accumulations)."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from vqtpu.composite import (
    GroupedResidualFSQ,
    GroupedResidualLFQ,
    GroupedResidualVQ,
)
from vqtpu.parallel import (
    group_parallel_forward,
    group_parallel_output_from_indices,
    make_mesh,
)


def group_mesh(n, extra_data=None):
    if extra_data is None:
        return make_mesh(('group',), shape=(n,), devices=jax.devices()[:n])
    return make_mesh(
        ('data', 'group'), shape=(extra_data, n),
        devices=jax.devices()[: extra_data * n],
    )


def make_pair(cls, **kwargs):
    """Two identically-initialized Grouped composites (same seed)."""
    return cls(rngs=nnx.Rngs(7), **kwargs), cls(rngs=nnx.Rngs(7), **kwargs)


def states_equal(a, b, atol=1e-6):
    sa, sb = nnx.state(a), nnx.state(b)
    for la, lb in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        if jax.dtypes.issubdtype(la.dtype, jax.dtypes.prng_key):
            assert jax.random.key_data(la).tolist() == \
                jax.random.key_data(lb).tolist()
        elif jnp.issubdtype(la.dtype, jnp.floating):
            assert jnp.allclose(la, lb, atol=atol), (la, lb)
        else:
            assert (la == lb).all(), (la, lb)


VQ_KW = dict(dim=16, groups=4, num_quantizers=3, codebook_size=32)


@pytest.mark.parametrize('axis_size', (4, 2))   # g_local = 1 and 2
@pytest.mark.parametrize('train', (True, False))
def test_vq_bit_identity(axis_size, train):
    serial, par = make_pair(GroupedResidualVQ, **VQ_KW)
    mesh = group_mesh(axis_size)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))

    for m in (serial, par):
        m.train() if train else m.eval()

    for step in range(2):
        xs = x + 0.1 * step
        q_s, ind_s, loss_s = serial(xs)
        q_p, ind_p, loss_p = group_parallel_forward(par, xs, mesh)
        assert (ind_s == ind_p).all()
        assert jnp.allclose(q_s, q_p, atol=2e-6)
        assert jnp.allclose(loss_s, loss_p, atol=2e-6)
    states_equal(serial, par)                 # EMA updates match


def test_vq_all_codes_and_decode():
    serial, par = make_pair(GroupedResidualVQ, **VQ_KW)
    mesh = group_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16))
    serial.eval(), par.eval()

    q_s, ind_s, loss_s, codes_s = serial(x, return_all_codes=True)
    q_p, ind_p, loss_p, codes_p = group_parallel_forward(
        par, x, mesh, return_all_codes=True
    )
    assert (ind_s == ind_p).all()
    assert jnp.allclose(q_s, q_p, atol=2e-6)
    assert len(codes_p) == 4
    for cs, cp in zip(codes_s, codes_p):
        assert jnp.allclose(cs, cp, atol=2e-6)

    dec_s = serial.get_output_from_indices(ind_s)
    dec_p = group_parallel_output_from_indices(par, ind_s, mesh)
    assert jnp.allclose(dec_s, dec_p, atol=2e-6)


def test_vq_quantize_dropout_shared_index():
    kw = dict(VQ_KW, quantize_dropout=True)
    serial, par = make_pair(GroupedResidualVQ, **kw)
    mesh = group_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 16))
    serial.train(), par.train()

    for step in range(3):                 # identical dropout draws per step
        q_s, ind_s, loss_s = serial(x)
        q_p, ind_p, loss_p = group_parallel_forward(par, x, mesh)
        assert (ind_s == ind_p).all()     # incl. identical -1 dropout slots
        assert jnp.allclose(q_s, q_p, atol=2e-6)
    states_equal(serial, par)


def test_vq_ce_loss_path():
    serial, par = make_pair(GroupedResidualVQ, **VQ_KW)
    mesh = group_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16))
    serial.eval(), par.eval()
    _, ind, _ = serial(x)
    indices = tuple(ind[g] for g in range(4))

    serial.train(), par.train()
    q_s, ce_s = serial(x, indices=indices)
    q_p, ce_p = group_parallel_forward(par, x, mesh, indices=indices)
    assert jnp.allclose(q_s, q_p, atol=2e-6)
    assert jnp.allclose(ce_s, ce_p, atol=1e-6)   # sum-of-groups order


def test_fsq_bit_identity():
    kw = dict(dim=8, groups=2, num_quantizers=2, levels=[8, 5, 5, 3])
    serial, par = make_pair(GroupedResidualFSQ, **kw)
    mesh = group_mesh(2)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 8))
    serial.eval(), par.eval()

    q_s, ind_s = serial(x)
    q_p, ind_p = group_parallel_forward(par, x, mesh)
    assert (ind_s == ind_p).all()
    assert jnp.allclose(q_s, q_p, atol=2e-6)

    dec_s = serial.get_output_from_indices(ind_s)
    dec_p = group_parallel_output_from_indices(par, ind_s, mesh)
    assert jnp.allclose(dec_s, dec_p, atol=2e-6)


def test_lfq_bit_identity_with_mask():
    kw = dict(dim=8, groups=2, num_quantizers=2, codebook_size=2 ** 4)
    serial, par = make_pair(GroupedResidualLFQ, **kw)
    mesh = group_mesh(2)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 8))
    mask = jnp.arange(16)[None, :] < jnp.array([16, 9])[:, None]
    serial.train(), par.train()

    q_s, ind_s, loss_s = serial(x, mask=mask)
    q_p, ind_p, loss_p = group_parallel_forward(par, x, mesh, mask=mask)
    assert (ind_s == ind_p).all()
    assert jnp.allclose(q_s, q_p, atol=2e-6)
    assert jnp.allclose(loss_s, loss_p, atol=2e-6)


def test_vq_2d_data_group_mesh():
    """data x group mesh: batch shards over `data`, members psum EMA stats
    over it (sync_axis). Matches serial up to psum summation order."""
    # serial oracle: full batch, no collective (psum'd shard stats == the
    # full-batch stats up to summation order); parallel side syncs over data
    serial = GroupedResidualVQ(rngs=nnx.Rngs(7), **VQ_KW)
    par = GroupedResidualVQ(rngs=nnx.Rngs(7), sync_axis='data', **VQ_KW)
    mesh = group_mesh(4, extra_data=2)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 24, 16))
    serial.train(), par.train()

    q_s, ind_s, loss_s = serial(x)
    q_p, ind_p, loss_p = group_parallel_forward(
        par, x, mesh, data_axis='data'
    )
    assert (ind_s == ind_p).all()
    assert jnp.allclose(q_s, q_p, atol=1e-6)
    assert jnp.allclose(loss_s, loss_p, atol=1e-6)
    states_equal(serial, par, atol=1e-6)      # EMA equal up to psum order


def test_fmap_layout():
    kw = dict(VQ_KW, accept_image_fmap=True)
    serial, par = make_pair(GroupedResidualVQ, **kw)
    mesh = group_mesh(4)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 4, 4))
    serial.eval(), par.eval()

    q_s, ind_s, loss_s = serial(x)
    q_p, ind_p, loss_p = group_parallel_forward(par, x, mesh)
    assert (ind_s == ind_p).all()
    assert jnp.allclose(q_s, q_p, atol=2e-6)


def test_stochastic_streams_decorrelated():
    """Stochastic sampling under group parallelism: per-group folded keys
    must give DIFFERENT noise per group (the serial loop interleaves one
    stream; correlated groups would be a statistical defect)."""
    kw = dict(
        dim=16, groups=2, num_quantizers=2, codebook_size=32,
        stochastic_sample_codes=True, sample_codebook_temp=100.0,
    )
    _, par = make_pair(GroupedResidualVQ, **kw)
    mesh = group_mesh(2)
    # identical features per group -> identical logits; only the gumbel
    # noise distinguishes the groups' indices
    half = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 8))
    x = jnp.concatenate([half, half], axis=-1)
    par.train()
    _, ind, _ = group_parallel_forward(par, x, mesh)
    assert not (ind[0] == ind[1]).all()
