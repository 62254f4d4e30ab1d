"""Core utility, gradient-estimator and kernel tests.

The Pallas kernel equivalence tests run the kernel in interpreter mode on
CPU and assert exact index agreement with the XLA formulation — the kernels
are an optimization layer, never a semantics layer (SURVEY.md §7).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqtpu.core import utils as U
from vqtpu.core import ste
from vqtpu.core.sampling import gumbel_sample, masked_sample_vectors
from vqtpu.kernels.distance import nearest_code, nearest_code_xla


def test_l2norm_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 7))
    y = U.l2norm(x)
    norms = jnp.linalg.norm(y, axis=-1)
    assert jnp.allclose(norms, 1.0, atol=1e-5)


def test_cdist_matches_direct():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 3))
    direct = jnp.sqrt(((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1))
    # the squared-expansion formulation loses a few bits to cancellation for
    # nearby points; the reference uses the same formulation (cdist :58-62)
    assert jnp.allclose(U.cdist(x, y), direct, atol=5e-3)


def test_lens_to_mask():
    mask = U.lens_to_mask(jnp.array([2, 0, 3]), 3)
    expected = jnp.array([[1, 1, 0], [0, 0, 0], [1, 1, 1]], bool)
    assert (mask == expected).all()


def test_masked_mean_matches_boolean_indexing():
    t = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3))
    mask = jnp.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]], bool)
    got = U.masked_mean(t, mask)
    want = np.asarray(t)[np.asarray(mask)].mean()
    assert jnp.allclose(got, want, atol=1e-6)


def test_straight_through_value_and_grad():
    src = jnp.array([1.0, 2.0])
    tgt = jnp.array([5.0, 7.0])
    out = ste.straight_through(src, tgt)
    assert jnp.allclose(out, tgt)
    g = jax.grad(lambda s: ste.straight_through(s, tgt).sum())(src)
    assert jnp.allclose(g, 1.0)


def test_round_ste():
    z = jnp.array([0.4, 1.6, -2.3])
    assert jnp.allclose(ste.round_ste(z), jnp.round(z))
    g = jax.grad(lambda t: ste.round_ste(t).sum())(z)
    assert jnp.allclose(g, 1.0)


def test_rotate_to_forward_value_close_to_target():
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (8, 16))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    out = ste.rotate_to(src, tgt)
    # forward value equals the target mathematically (rotation maps src-dir
    # to tgt-dir and rescales); allow float error
    assert jnp.allclose(out, tgt, atol=1e-4)
    g = jax.grad(lambda s: (ste.rotate_to(s, tgt) ** 2).sum())(src)
    assert jnp.isfinite(g).all()


def test_directional_reparam_value():
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (4, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    out = ste.directional_reparam(jax.random.PRNGKey(2), src, tgt, noise_variance=0.0)
    # with zero noise the output is exactly the target
    assert jnp.allclose(out, tgt, atol=1e-5)


def test_frac_gradient():
    x = jnp.array([3.0])
    for frac, expected in ((0.0, 0.0), (0.5, 0.5), (1.0, 1.0)):
        g = jax.grad(lambda t: ste.frac_gradient(t, frac).sum())(x)
        assert jnp.allclose(g, expected)


def test_gumbel_sample_argmax():
    logits = jnp.array([[0.1, 2.0, -1.0], [3.0, 0.0, 0.5]])
    ind, one_hot = gumbel_sample(None, logits, training=False)
    assert (ind == jnp.array([1, 0])).all()
    assert (one_hot.argmax(-1) == ind).all()


def test_gumbel_sample_topk():
    logits = jnp.array([[0.1, 2.0, -1.0, 1.5]])
    ind, one_hot = gumbel_sample(None, logits, training=False, topk=2)
    assert ind.shape == (1, 2)
    assert (ind[0] == jnp.array([1, 3])).all()
    assert one_hot.shape == (1, 2, 4)


def test_gumbel_sample_straight_through_grads():
    logits = jnp.array([[0.1, 2.0, -1.0]])

    def f(l):
        _, oh = gumbel_sample(
            None, l, temperature=1.0, straight_through=True, training=True
        )
        return (oh * jnp.arange(3)).sum()

    g = jax.grad(f)(logits)
    assert (jnp.abs(g) > 0).any()


def test_masked_sample_vectors_only_selects_valid():
    samples = jnp.arange(10, dtype=jnp.float32)[:, None]
    mask = jnp.array([1, 0, 1, 0, 0, 0, 0, 0, 0, 0], bool)
    out = masked_sample_vectors(jax.random.PRNGKey(0), samples, mask, 32)
    assert set(np.unique(np.asarray(out))) <= {0.0, 2.0}


@pytest.mark.parametrize('metric', ('euclidean', 'cosine'))
@pytest.mark.parametrize('n,c,d', ((300, 130, 96), (1024, 512, 256), (64, 8, 32)))
def test_nearest_code_kernel_matches_xla(metric, n, c, d):
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    e = jax.random.normal(jax.random.PRNGKey(1), (c, d))
    if metric == 'cosine':
        x = U.l2norm(x)
        e = U.l2norm(e)
    want = nearest_code_xla(x, e, metric)
    got = nearest_code(x, e, metric, interpret=True)
    assert (want == got).all()


def test_nearest_code_batched_heads():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 50, 16))
    e = jax.random.normal(jax.random.PRNGKey(1), (3, 20, 16))
    want = jax.vmap(nearest_code_xla)(x, e)
    got = nearest_code(x, e, interpret=True)
    assert (want == got).all()


def test_eval_mode_propagates_through_plain_nnx_parent():
    # Regression: quantizers nested inside a user's plain nnx.Module must
    # leave training mode when the *parent*'s .eval() is called (nnx
    # propagates `deterministic=True`, which backs our `training` flag).
    # Otherwise EMA updates keep firing during eval and decode round-trips
    # desync from forward outputs.
    from flax import nnx
    from vqtpu import VectorQuantize

    class Parent(nnx.Module):
        def __init__(self, rngs):
            self.vq = VectorQuantize(dim=8, codebook_size=16, decay=0.8,
                                     rngs=rngs)

    p = Parent(nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    p.vq(z)  # train-mode step (kmeans-free init + EMA)
    p.eval()
    assert not p.vq.training and not p.vq._codebook.training

    before = np.asarray(p.vq._codebook.embed.value).copy()
    q, ind, _ = p.vq(z + 0.5)
    after = np.asarray(p.vq._codebook.embed.value)
    assert (before == after).all(), 'EMA fired during eval'
    assert jnp.allclose(q, p.vq.get_output_from_indices(ind), atol=1e-6)

    p.train()
    assert p.vq.training and p.vq._codebook.training


def test_codebook_metrics():
    from vqtpu.core import metrics

    # uniform usage over 4 codes -> perplexity 4, utilization 1
    ind = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    assert np.isclose(float(metrics.codebook_perplexity(ind, 4)), 4.0)
    assert float(metrics.codebook_utilization(ind, 4)) == 1.0

    # collapsed -> perplexity 1
    ind = jnp.zeros(16, jnp.int32)
    assert np.isclose(float(metrics.codebook_perplexity(ind, 8)), 1.0)
    assert np.isclose(float(metrics.codebook_utilization(ind, 8)), 1 / 8)

    # -1 padding ignored
    ind = jnp.array([0, 1, -1, -1])
    h = metrics.index_histogram(ind, 4)
    assert h.tolist() == [1.0, 1.0, 0.0, 0.0]

    # mask-aware
    ind = jnp.array([0, 1, 2, 3])
    mask = jnp.array([True, True, False, False])
    h = metrics.index_histogram(ind, 4, mask)
    assert h.tolist() == [1.0, 1.0, 0.0, 0.0]

    # ema variants accept (h, c) and reduce last axis
    cs = jnp.ones((2, 8))
    assert np.allclose(np.asarray(metrics.ema_perplexity(cs)), 8.0)
    assert float(metrics.ema_utilization(cs)) == 1.0

    # jit-compatible
    f = jax.jit(lambda i: metrics.codebook_perplexity(i, 4))
    assert np.isfinite(float(f(jnp.array([0, 1, 2, 3]))))


def test_timeit_chained_measures_work():
    from vqtpu.utils import timeit_chained

    x = jax.random.normal(jax.random.PRNGKey(0), (256, 256))
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 256))

    # wall-clock slopes on a loaded CI host are noisy — take the best of a
    # few attempts before declaring the harness broken
    for attempt in range(3):
        t_small = timeit_chained(lambda a, b: a @ b, x, w, lo=2, hi=6)
        t_big = timeit_chained(
            lambda a, b: ((a @ b) @ b) @ b, x, w, lo=2, hi=6)
        if t_small > 0 and t_big > t_small:
            return
    assert t_small > 0
    assert t_big > t_small  # 3x the matmuls must cost measurably more


def test_nearest_code_tie_breaking_all_zero_input():
    # all-zero tokens + duplicate codebook rows: every path must pick the
    # LOWEST index (first-index tie-break, matching jnp.argmin)
    x = jnp.zeros((16, 8))
    e = jnp.zeros((12, 8))                       # all rows tie
    assert (nearest_code_xla(x, e) == 0).all()
    assert (nearest_code(x, e, interpret=True) == 0).all()

    # duplicated row block: distances tie between i and i+6
    e2 = jnp.concatenate([jnp.eye(6, 8), jnp.eye(6, 8)], axis=0)
    xq = jnp.eye(6, 8)
    assert (nearest_code_xla(xq, e2) == jnp.arange(6)).all()
    assert (nearest_code(xq, e2, interpret=True) == jnp.arange(6)).all()


def test_sharded_tie_breaking_lowest_global_index():
    from jax.sharding import Mesh, PartitionSpec as P
    from vqtpu.parallel.shard import make_mesh, sharded_nearest_code

    # identical rows on EVERY shard: global winner must be index 0
    mesh = make_mesh(('code',))
    x = jnp.zeros((16, 8))
    e = jnp.zeros((32, 8))

    got = jax.jit(jax.shard_map(
        lambda x, es: sharded_nearest_code(x, es, 'code'),
        mesh=mesh, in_specs=(P(), P('code')), out_specs=P(),
        check_vma=False,
    ))(x, e)
    assert (got == 0).all()


def test_sequential_registry_covers_every_public_quantizer():
    # every public quantizer class must be routable by vqtpu.Sequential
    # (reference utils.py:20-36 QUANTIZE_KLASSES registry)
    import vqtpu
    from vqtpu.composite.sequential import QUANTIZE_KLASSES

    # BinaryMapper consumes logits, not features, so it is not routable
    # through Sequential — excluded upstream too (reference utils.py:20-36)
    public = {n for n in vqtpu.__all__
              if isinstance(getattr(vqtpu, n, None), type)
              and n not in ('Sequential', 'LossBreakdown', 'BinaryMapper')}
    registered = {k.__name__ for k in QUANTIZE_KLASSES}
    missing = public - registered
    assert not missing, f'quantizers missing from Sequential registry: {missing}'


def test_vq_traced_equals_eager():
    # the jitted train step must match the eager step bit-for-bit (catches
    # python-side branching on traced values)
    from flax import nnx
    from vqtpu import VectorQuantize

    def run(jit):
        vq = VectorQuantize(dim=8, codebook_size=16, decay=0.8,
                            threshold_ema_dead_code=2, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))

        def fwd(vq, x):
            return vq(x)

        f = nnx.jit(fwd) if jit else fwd
        outs = []
        for i in range(3):
            q, ind, loss = f(vq, x + i * 0.1)
            outs.append((np.asarray(q), np.asarray(ind), float(loss)))
        return outs, np.asarray(vq.codebook)

    eager, cb_e = run(False)
    traced, cb_t = run(True)
    for (qe, ie, le), (qt, it, lt) in zip(eager, traced):
        assert (ie == it).all()
        np.testing.assert_allclose(qe, qt, atol=1e-6)
        assert abs(le - lt) < 1e-6
    np.testing.assert_allclose(cb_e, cb_t, atol=1e-6)


@pytest.mark.parametrize('seed', range(6))
def test_nearest_code_random_shapes_property(seed):
    # random (n, c, d) incl. non-multiples of 8/128: kernel (interpret) and
    # XLA must agree exactly, and the quantize pipeline must round-trip
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    c = int(rng.integers(2, 300))
    d = int(rng.integers(1, 300))
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, d))
    e = jax.random.normal(jax.random.PRNGKey(seed + 1000), (c, d))
    want = nearest_code_xla(x, e)
    got = nearest_code(x, e, interpret=True)
    assert (want == got).all(), (n, c, d)

    from vqtpu.kernels.distance import gather_codes
    q = gather_codes(e, want)
    assert q.shape == (n, d)
    assert (q == jnp.take(e, want, axis=0)).all()


def test_bf16_tier_exact_on_bf16_inputs():
    """The bf16 serving tier (quantize_lookup tier='bf16') must be EXACT
    with respect to the bf16-cast values: returned rows are bit-equal to the
    bf16 codebook rows at the returned indices, and the indices agree with a
    f32 argmin oracle over the same bf16 values except at provable
    near-ties."""
    from vqtpu.kernels.distance import quantize_lookup

    n, c, d = 4096, 512, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    e = jax.random.normal(jax.random.PRNGKey(1), (c, d))

    idx, q = quantize_lookup(x, e, tier='bf16')
    eb = e.astype(jnp.bfloat16)

    # lookup exactness: rows ARE the bf16 codebook rows
    assert (np.asarray(q) == np.asarray(jnp.take(eb, idx, axis=0))).all()

    # selection oracle on the same bf16 values, f32 math
    xf = x.astype(jnp.bfloat16).astype(jnp.float32)
    ef = eb.astype(jnp.float32)
    oracle = nearest_code_xla(xf, ef)
    agree = np.asarray(idx == oracle)
    if not agree.all():
        # disagreements must be floating-point near-ties, not real misses
        d2 = np.asarray(U.cdist_sq(xf, ef))
        picked = d2[np.arange(n), np.asarray(idx)]
        best = d2[np.arange(n), np.asarray(oracle)]
        gap = np.abs(picked - best)[~agree]
        assert agree.mean() > 0.999, agree.mean()
        assert (gap <= 1e-3 * np.abs(best[~agree]).max()).all(), gap.max()


@pytest.mark.parametrize('metric', ('euclidean', 'cosine'))
@pytest.mark.parametrize('blocks', (None, (1024, 1024), (4096, 256),
                                    (2048, 512)))
def test_tiled_selection_kernel_matches_xla(metric, blocks):
    """The tiled-codebook selection kernel (codebook streamed through VMEM,
    running argmax carry in scratch — the path for codebooks beyond the
    resident-VMEM budget) must agree exactly with the XLA argmin, including
    non-multiple shapes and padded tiles, across the blocking sweep (r4
    restructure: inverted aspect amortizes codebook re-streaming; None =
    the auto policy)."""
    from vqtpu.kernels.distance import _nearest_code_tiled

    n, c, d = 1000, 5000, 130
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    e = jax.random.normal(jax.random.PRNGKey(1), (c, d))
    if metric == 'cosine':
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    want = nearest_code_xla(x, e, metric)
    block_n, c_tile = blocks if blocks else (None, None)
    got = _nearest_code_tiled(x, e, metric, block_n=block_n, c_tile=c_tile,
                              interpret=True)
    assert (want == got).all()


@pytest.mark.parametrize('seed', range(4))
def test_native_oracle_parity_fuzz(seed):
    """Three-way parity fuzz: the independent C oracle (double-precision
    direct |x-e|^2, native/vqcheck.c — shares no algebra or framework with
    the kernels), the XLA squared-expansion argmin, and the Pallas kernel
    must agree on random shapes. f32 squared-expansion can flip genuine
    near-ties vs the double oracle, so oracle disagreements must be
    provable near-ties; kernel-vs-XLA must be exact."""
    from vqtpu.kernels import native_check

    if not native_check.available():
        pytest.skip('native toolchain unavailable')

    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 300))
    c = int(rng.integers(4, 200))
    d = int(rng.integers(2, 150))
    metric = 'cosine' if seed % 2 else 'euclidean'
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (n, d)))
    e = np.asarray(jax.random.normal(jax.random.PRNGKey(seed + 99), (c, d)))
    if metric == 'cosine':
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        e = e / np.linalg.norm(e, axis=-1, keepdims=True)

    oracle = native_check.nearest_code_ref(x, e, metric)
    got_xla = np.asarray(nearest_code_xla(jnp.asarray(x), jnp.asarray(e), metric))
    got_pal = np.asarray(nearest_code(jnp.asarray(x), jnp.asarray(e), metric,
                                      interpret=True))

    assert (got_xla == got_pal).all(), (n, c, d, metric)

    mismatch = oracle != got_xla
    if mismatch.any():
        # must be near-ties at f32 resolution
        xe = x.astype(np.float64)
        ee = e.astype(np.float64)
        d2 = ((xe[:, None, :] - ee[None]) ** 2).sum(-1) if metric == 'euclidean' \
            else -(xe @ ee.T)
        picked = d2[np.arange(n), got_xla]
        best = d2[np.arange(n), oracle]
        gap = np.abs(picked - best)[mismatch]
        scale = np.abs(d2).max()
        assert (gap <= 1e-5 * scale).all(), (gap.max(), n, c, d, metric)


@pytest.mark.parametrize('metric', ('euclidean', 'cosine'))
@pytest.mark.parametrize('shape', ((1024, 64, 96), (1000, 130, 100)))
def test_fused_train_quantize_matches_oracle(metric, shape):
    """The fused training kernel (selection + exact lookup + EMA statistics
    in one VMEM pass, kernels/train_fused.py) must reproduce the XLA
    composition: nearest_code indices with first-index tie-break, BIT-EXACT
    codebook rows, and the weighted one-hot statistics."""
    from vqtpu.kernels.train_fused import fused_train_quantize

    n, c, d = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d))
    e = jax.random.normal(jax.random.PRNGKey(1), (c, d))
    if metric == 'cosine':
        x = U.l2norm(x)
        e = U.l2norm(e)
    w = (jax.random.uniform(jax.random.PRNGKey(2), (n,)) > 0.3).astype(
        jnp.float32)

    idx, q, bins, esum = fused_train_quantize(
        x, e, metric, weights=w, interpret=True)

    oracle_idx = nearest_code_xla(x, e, metric)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(oracle_idx))

    np.testing.assert_array_equal(
        np.asarray(q), np.asarray(jnp.take(e, idx, axis=0)))

    onehot = jax.nn.one_hot(idx, c, dtype=jnp.float32) * w[:, None]
    np.testing.assert_allclose(
        np.asarray(bins), np.asarray(onehot.sum(axis=0)), atol=1e-4)
    oracle_esum = jnp.einsum(
        'nd,nc->cd', x, onehot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(esum), np.asarray(oracle_esum), rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize('seed', range(4, 7))
def test_native_oracle_fused_train_fuzz(seed):
    """The fused train kernel joins the three-way fuzz: its indices must
    match the XLA argmin exactly (and the C double-precision oracle up to
    provable f32 near-ties), its lookup rows must be bit-exact codebook
    rows, and its statistics must match a numpy accumulation."""
    from vqtpu.kernels import native_check
    from vqtpu.kernels.train_fused import fused_train_quantize

    if not native_check.available():
        pytest.skip('native toolchain unavailable')

    rng = np.random.default_rng(seed)
    n = int(rng.integers(8, 300))
    c = int(rng.integers(4, 200))
    d = int(rng.integers(2, 150))
    metric = 'cosine' if seed % 2 else 'euclidean'
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (n, d)))
    e = np.asarray(jax.random.normal(jax.random.PRNGKey(seed + 99), (c, d)))
    if metric == 'cosine':
        x = x / np.linalg.norm(x, axis=-1, keepdims=True)
        e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    w = np.asarray(
        (jax.random.uniform(jax.random.PRNGKey(seed + 7), (n,)) > 0.25)
    ).astype(np.float32)

    idx, q, bins, esum = fused_train_quantize(
        jnp.asarray(x), jnp.asarray(e), metric,
        weights=jnp.asarray(w), interpret=True)
    idx = np.asarray(idx)

    got_xla = np.asarray(
        nearest_code_xla(jnp.asarray(x), jnp.asarray(e), metric))
    assert (idx == got_xla).all(), (n, c, d, metric)

    oracle = native_check.nearest_code_ref(x, e, metric)
    mismatch = oracle != idx
    if mismatch.any():
        xe, ee = x.astype(np.float64), e.astype(np.float64)
        d2 = ((xe[:, None, :] - ee[None]) ** 2).sum(-1) if metric == 'euclidean' \
            else -(xe @ ee.T)
        gap = np.abs(
            d2[np.arange(n), idx] - d2[np.arange(n), oracle])[mismatch]
        assert (gap <= 1e-5 * np.abs(d2).max()).all(), (n, c, d, metric)

    # lookup rows: bit-exact
    np.testing.assert_array_equal(np.asarray(q), e[idx])
    # stats vs numpy accumulation
    np.testing.assert_allclose(
        np.asarray(bins),
        np.bincount(idx, weights=w, minlength=c), atol=1e-4)
    esum_ref = np.zeros((c, d), np.float64)
    np.add.at(esum_ref, idx, x.astype(np.float64) * w[:, None])
    np.testing.assert_allclose(
        np.asarray(esum), esum_ref.astype(np.float32), rtol=1e-5, atol=1e-4)
