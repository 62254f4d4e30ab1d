"""Distributed tests on the 8-device virtual CPU mesh — coverage the
reference cannot have (its distributed paths are inert under single-process
pytest, SURVEY.md §4). The bar: psum'd EMA statistics make a sharded run
bit-identical to a single-device run on the same global batch."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P

from vqtpu.quantizers import VectorQuantize, LFQ
from vqtpu.parallel.shard import (
    DataParallelTrainer,
    make_mesh,
    sharded_nearest_code,
)
from vqtpu.kernels.distance import nearest_code_xla


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def _run_vq_ema(sync_axis, mesh, x):
    """Run 3 training forwards of an EMA VQ over (optionally sharded) data;
    return the final codebook."""
    vq = VectorQuantize(
        dim=16, codebook_size=32, decay=0.8, sync_axis=sync_axis,
        rngs=nnx.Rngs(0),
    )
    if sync_axis is None:
        for i in range(3):
            vq(x[i])
        return np.array(vq.codebook)

    graphdef, state = nnx.split(vq)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        m(batch)
        _, new_state = nnx.split(m)
        return new_state

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
        check_vma=False,
    ))
    for i in range(3):
        state = step(state, x[i])
    vq2 = nnx.merge(graphdef, state)
    return np.array(vq2.codebook)


def test_ema_bit_parity_1dev_vs_8dev():
    """Same global batch: 8-way sharded EMA (psum'd stats) must match the
    single-device codebook to float tolerance."""
    mesh = make_mesh(('data',))
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 8, 16))

    single = _run_vq_ema(None, None, x)
    sharded = _run_vq_ema('data', mesh, x)

    np.testing.assert_allclose(single, sharded, atol=1e-5)


def test_ema_replicas_stay_identical():
    """After sharded training steps the state must be identical on every
    device (out_specs=P() asserts replication; this also exercises psum'd
    kmeans + expiry)."""
    mesh = make_mesh(('data',))
    vq = VectorQuantize(
        dim=16, codebook_size=16, decay=0.8, sync_axis='data',
        kmeans_init=True, kmeans_iters=3, threshold_ema_dead_code=2,
        rngs=nnx.Rngs(0),
    )
    graphdef, state = nnx.split(vq)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        q, ind, loss = m(batch)
        _, new_state = nnx.split(m)
        return new_state, jax.lax.pmean(loss, 'data')

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P('data')), out_specs=(P(), P()),
        check_vma=False,
    ))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 16))
    state, loss = step(state, x)
    state, loss = step(state, x)
    assert jnp.isfinite(loss)
    vq2 = nnx.merge(graphdef, state)
    assert bool(vq2._codebook.initted[...])


def test_lfq_distributed_entropy_matches_single():
    """LFQ's batch entropy term psums avg_prob: sharded loss == single-device
    loss on the same global batch."""
    mesh = make_mesh(('data',))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 8))

    lfq_single = LFQ(codebook_size=256, dim=8, rngs=nnx.Rngs(0))
    _, _, loss_single = lfq_single(x)

    lfq_sharded = LFQ(codebook_size=256, dim=8, sync_axis='data', rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(lfq_sharded)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        _, _, loss = m(batch)
        # per-sample entropy is a local mean; average it like DDP grad-sync
        return jax.lax.pmean(loss, 'data')

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
        check_vma=False,
    ))
    loss_sharded = step(state, x)
    # the codebook-entropy component is computed from the global avg_prob in
    # both cases; per-sample entropy is an equal-shard mean == global mean
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-5
    )


def test_data_parallel_trainer_converges():
    class Model(nnx.Module):
        def __init__(self, rngs):
            self.enc = nnx.Linear(8, 16, rngs=rngs)
            self.vq = VectorQuantize(
                dim=16, codebook_size=32, sync_axis='data', rngs=rngs
            )
            self.dec = nnx.Linear(16, 8, rngs=rngs)

        def __call__(self, x):
            z = self.enc(x)
            q, ind, commit = self.vq(z)
            return self.dec(q), commit

    def loss_fn(model, batch):
        out, commit = model(batch)
        return ((out - batch) ** 2).mean() + commit

    mesh = make_mesh(('data',))
    model = Model(nnx.Rngs(0))
    trainer = DataParallelTrainer(model, optax.adam(1e-2), loss_fn, mesh)

    x = jax.random.normal(jax.random.PRNGKey(0), (32, 4, 8))
    losses = [float(trainer.step(x)) for _ in range(20)]
    assert losses[-1] < losses[0]


@pytest.mark.parametrize('metric', ('euclidean', 'cosine'))
def test_sharded_nearest_code_matches_unsharded(metric):
    """Codebook rows sharded over the mesh: the distributed argmin must agree
    with the replicated argmin exactly."""
    mesh = make_mesh(('data',))
    n, c, d = 64, 64, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    embed = jax.random.normal(jax.random.PRNGKey(1), (c, d))
    if metric == 'cosine':
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        embed = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True)

    want = nearest_code_xla(x, embed, metric)

    def body(x, embed_shard):
        return sharded_nearest_code(x, embed_shard, 'code', metric)

    got = jax.jit(jax.shard_map(
        body, mesh=Mesh(np.array(jax.devices()), ('code',)),
        in_specs=(P(), P('code')), out_specs=P(),
        check_vma=False,
    ))(x, embed)

    assert (want == got).all()


def test_kmeans_init_sharded_quality_matches_single():
    """Sharded kmeans init draws its initial means from an all-gathered
    candidate pool (different draw than single-device by design, mirroring
    the reference's distributed sampling, vector_quantize_pytorch.py:193-229)
    — so the invariant is QUALITY parity, not bit parity: quantization error
    on the same global batch must be comparable. Replica identity is
    asserted separately (test_ema_replicas_stay_identical)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8, 16))

    def run(sync_axis, mesh):
        vq = VectorQuantize(
            dim=16, codebook_size=8, decay=0.8, sync_axis=sync_axis,
            kmeans_init=True, kmeans_iters=4, rngs=nnx.Rngs(0),
        )
        if sync_axis is None:
            vq(x)
            return np.array(vq.codebook)
        graphdef, state = nnx.split(vq)

        def body(state, batch):
            m = nnx.merge(graphdef, state)
            m(batch)
            _, new_state = nnx.split(m)
            return new_state

        step = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
            check_vma=False,
        ))
        state = step(state, x)
        return np.array(nnx.merge(graphdef, state).codebook)

    single = run(None, None)
    sharded = run('data', make_mesh(('data',)))

    def quant_err(codebook):
        flat = np.asarray(x).reshape(-1, 16)
        d = ((flat[:, None, :] - codebook[None]) ** 2).sum(-1)
        return float(d.min(axis=1).mean())

    e1, e8 = quant_err(single), quant_err(sharded)
    assert e8 < e1 * 1.25, (e1, e8)


def test_sharded_codebook_vq_parity_2d_mesh():
    """Row-sharded codebook on a 2D (data, code) mesh vs the unsharded
    Codebook engine on the same global batch (the north-star TP extension):
    indices BIT-identical; EMA state within 1-2 ulps (the data-axis psum
    sums per-shard partials in a different order than one global einsum,
    so the last bit can differ — measured maxdiff 2.4e-7 over 2 steps)."""
    from vqtpu.codebook.codebook import Codebook
    from vqtpu.parallel.sharded_vq import (
        init_sharded_codebook, sharded_quantize, sharded_ema_update,
    )

    d, c = 16, 32
    n = 64
    mesh = make_mesh(('data', 'code'), shape=(2, 4))
    key = jax.random.PRNGKey(0)
    embed = jax.random.normal(key, (c, d))
    x = jax.random.normal(jax.random.PRNGKey(1), (n, d))

    # ---- unsharded engine, 2 EMA steps ----
    cb = Codebook(dim=d, codebook_size=c, decay=0.8,
                  threshold_ema_dead_code=0, rngs=nnx.Rngs(0))
    cb.embed.value = embed[None]
    cb.embed_avg.value = embed[None].astype(jnp.float32)
    cb.cluster_size.value = jnp.ones((1, c), jnp.float32)
    q_ref = i_ref = None
    for step in range(2):
        q_ref, i_ref, _ = cb(x[None] + step * 0.1)

    # ---- sharded engine on the 2D mesh ----
    def body(state, embed_shard, xs):
        idx, q = sharded_quantize(xs, state.embed, 'code')
        new_state = sharded_ema_update(
            state, xs, idx, code_axis='code', data_axis='data', decay=0.8,
        )
        return new_state, idx, q

    from vqtpu.parallel.sharded_vq import ShardedCodebookState
    state = ShardedCodebookState(
        embed=embed,
        embed_avg=embed.astype(jnp.float32),
        cluster_size=jnp.ones(c, jnp.float32),
    )
    # in_specs for the state: rows over 'code'
    stepped = jax.jit(jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            ShardedCodebookState(P('code'), P('code'), P('code')),
            P('code'), P('data'),
        ),
        out_specs=(
            ShardedCodebookState(P('code'), P('code'), P('code')),
            P('data'), P('data'),
        ),
        check_vma=False,
    ))

    idx = q = None
    for step in range(2):
        state, idx, q = stepped(state, embed, x + step * 0.1)

    assert (np.asarray(idx) == np.asarray(i_ref[0])).all(), 'selection parity'
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(q_ref[0]), atol=1e-5, err_msg='lookup')
    np.testing.assert_allclose(
        np.asarray(state.cluster_size), np.asarray(cb.cluster_size[...][0]),
        atol=1e-5, err_msg='cluster_size')
    np.testing.assert_allclose(
        np.asarray(state.embed), np.asarray(cb.embed[...][0]), atol=1e-5,
        err_msg='EMA embed')


def test_fsp_distributed_moments_match_single():
    """FSP's VectorNorm regularizer computes GLOBAL batch moments under DP
    (sync_axis): sharded loss == single-device loss on the same global
    batch (the reference has no distributed FSP at all)."""
    from vqtpu.quantizers import FSP

    mesh = make_mesh(('data',))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8, 3))

    single = FSP(levels=[8, 6, 5], quantize_rate=1.0, rngs=nnx.Rngs(0))
    _, _, loss_single, _ = single(x)

    sharded = FSP(levels=[8, 6, 5], quantize_rate=1.0, sync_axis='data',
                  rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(sharded)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        _, _, loss, _ = m(batch)
        return loss

    loss_sharded = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
        check_vma=False,
    ))(state, x)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=2e-4)


def test_sharded_training_is_deterministic():
    """Two identical sharded training runs must produce bit-identical
    codebook state (fixed psum reduction order + f32 accumulation — the
    cross-host determinism requirement, SURVEY.md hard part 7)."""
    def run():
        mesh = make_mesh(('data',))
        vq = VectorQuantize(
            dim=16, codebook_size=16, decay=0.8, sync_axis='data',
            kmeans_init=True, kmeans_iters=3, threshold_ema_dead_code=2,
            rngs=nnx.Rngs(0),
        )
        graphdef, state = nnx.split(vq)

        def body(state, batch):
            m = nnx.merge(graphdef, state)
            m(batch)
            _, new_state = nnx.split(m)
            return new_state

        step = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
            check_vma=False,
        ))
        for i in range(3):
            x = jax.random.normal(jax.random.PRNGKey(i), (16, 8, 16))
            state = step(state, x)
        return np.array(nnx.merge(graphdef, state).codebook)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_axis_is_bound_survives_probe_api_removal(monkeypatch):
    """axis_is_bound must fall back gracefully if a jax upgrade removes the
    private axis-names probe AND changes the unbound-axis exception type
    (r2 advisor finding): out-of-mesh use (checkpointing, decode) must
    report False, in-mesh use True."""
    from vqtpu.parallel import collectives

    def gone(*a, **k):
        raise AttributeError('API removed')

    monkeypatch.setattr(
        jax.core, 'unsafe_get_axis_names_DO_NOT_USE', gone, raising=False
    )

    # out of any mesh: must be False, not an exception — even if lax.axis_size
    # raises something other than NameError
    assert collectives.axis_is_bound(None) is False
    assert collectives.axis_is_bound('code') is False

    # inside a shard_map binding the axis: must be True
    mesh = make_mesh(('data',))

    def body(x):
        flag = collectives.axis_is_bound('data')
        return x + (1.0 if flag else 0.0)

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False,
    ))(jnp.zeros(()))
    assert float(out) == 1.0


def test_grad_collectives_semantics():
    """Unit semantics of the gradient-correct collectives: all_gather_exact's
    transpose hands each shard its own block unscaled; psum_in_bwd psums the
    cotangent; slice_local_cols scatters + psums to a replicated full
    cotangent. (The plain all_gather transpose is psum_scatter — with a
    replicated cotangent it would scale each block by the axis size.)"""
    from vqtpu.parallel import collectives
    from vqtpu.parallel.shard import slice_local_cols

    mesh = make_mesh(('code',))
    world = 8
    x = jnp.arange(world * 2, dtype=jnp.float32).reshape(world, 2)
    w = jnp.arange(world * 2, dtype=jnp.float32).reshape(world * 2) + 1.0

    def body(xs):
        # xs: (1, 2) local block
        def f(v):
            full = collectives.all_gather_exact(v, 'code', concat_axis=0)
            # replicated loss of the gathered value
            return (full.reshape(-1) * w).sum()

        g = jax.grad(f)(xs)
        return g

    g = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P('code'), out_specs=P('code'),
        check_vma=False,
    ))(x)
    # each shard's block cotangent = its own w slice, UNSCALED
    np.testing.assert_allclose(np.asarray(g), np.asarray(w.reshape(world, 2)))

    def body2(rep):
        # rep: replicated (world*2,) vector; each shard consumes only its
        # own slice -> psum_in_bwd reassembles the full gradient
        def f(v):
            v = collectives.psum_in_bwd(v, 'code')
            i = jax.lax.axis_index('code')
            mine = jax.lax.dynamic_slice_in_dim(v, i * 2, 2)
            return (mine * jax.lax.dynamic_slice_in_dim(w, i * 2, 2)).sum()

        return jax.grad(f)(rep)

    g2 = jax.jit(jax.shard_map(
        body2, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False,
    ))(jnp.zeros(world * 2))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(w))

    def body3(rep):
        # slice_local_cols over the last axis of a replicated (3, c) tensor
        def f(v):
            mine = slice_local_cols(v, 2, 'code')     # (3, 2)
            i = jax.lax.axis_index('code')
            ww = jax.lax.dynamic_slice_in_dim(w, i * 2, 2)
            return (mine * ww[None, :]).sum()

        return jax.grad(f)(rep)

    g3 = jax.jit(jax.shard_map(
        body3, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False,
    ))(jnp.zeros((3, world * 2)))
    np.testing.assert_allclose(
        np.asarray(g3), np.broadcast_to(np.asarray(w), (3, world * 2)))


def test_train_fused_dp_replicas_stay_identical():
    """train_fused='on' under data-parallel shard_map: the fused kernel's
    per-shard statistics psum over the data axis exactly like the XLA
    composition's, so replicas stay bit-identical and the DP run matches
    the fused single-device run on the same global batch."""
    mesh = make_mesh(('data',))
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 16, 8, 16))

    # single-device fused run on the global batch
    ref = VectorQuantize(dim=16, codebook_size=32, decay=0.8,
                         train_fused='on', rngs=nnx.Rngs(0))
    ref_inds = []
    for i in range(3):
        _, ind, _ = ref(x[i])
        ref_inds.append(np.asarray(ind))

    # 8-way DP fused run
    vq = VectorQuantize(dim=16, codebook_size=32, decay=0.8,
                        sync_axis='data', train_fused='on', rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(vq)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        _, ind, _ = m(batch)
        _, new_state = nnx.split(m)
        return new_state, ind

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P('data')), out_specs=(P(), P('data')),
        check_vma=False,
    ))
    for i in range(3):
        state, ind = step(state, x[i])
        assert (np.asarray(ind) == ref_inds[i]).all(), f'step {i} indices'
    tp = nnx.merge(graphdef, state)

    # 1-2 ulp tolerance: the sharded and single-device programs fuse the
    # EMA lerp differently (fma vs mul+add) — verified identical drift in
    # the standard (train_fused='off') path, so not a kernel artifact
    np.testing.assert_allclose(
        np.asarray(tp._codebook.cluster_size[...]),
        np.asarray(ref._codebook.cluster_size[...]), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tp._codebook.embed[...]),
        np.asarray(ref._codebook.embed[...]), atol=2e-6)


def test_lfq_fused_entropy_composes_with_data_sharding():
    """The fused Pallas entropy sweeps run inside shard_map (interpret
    mode): sharded loss == single-device loss on the same global batch,
    same as the streamed path."""
    mesh = make_mesh(('data',))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 8))

    kw = dict(codebook_size=256, dim=8, entropy_chunk_size=64)
    lfq_single = LFQ(**kw, entropy_fused='on', rngs=nnx.Rngs(0))
    _, _, loss_single = lfq_single(x)

    lfq_sharded = LFQ(**kw, entropy_fused='on', sync_axis='data',
                      rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(lfq_sharded)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        _, _, loss = m(batch)
        return jax.lax.pmean(loss, 'data')

    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
        check_vma=False,
    ))
    loss_sharded = step(state, x)
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-5
    )
