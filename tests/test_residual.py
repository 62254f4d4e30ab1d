"""Composite quantizer tests (ResidualVQ family, Residual FSQ/LFQ/SimVQ,
HierarchicalVQ, Sequential), mirroring reference tests/test_readme.py
round-trip oracles and tests/test_beam.py equivalence oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vqtpu.composite import (
    GroupedResidualFSQ,
    GroupedResidualLFQ,
    GroupedResidualVQ,
    HierarchicalVQ,
    ResidualFSQ,
    ResidualLFQ,
    ResidualSimVQ,
    ResidualVQ,
    Sequential,
)
from vqtpu.quantizers import VectorQuantize


@pytest.mark.parametrize(
    'implicit_neural_codebook, use_cosine_sim',
    ((True, False), (False, True), (False, False)),
)
@pytest.mark.parametrize('train', (True, False))
@pytest.mark.parametrize('shared_codebook', (True, False))
def test_residual_vq_round_trip(implicit_neural_codebook, use_cosine_sim,
                                train, shared_codebook):
    rvq = ResidualVQ(
        dim=16, num_quantizers=4, codebook_size=32,
        implicit_neural_codebook=implicit_neural_codebook,
        use_cosine_sim=use_cosine_sim,
        shared_codebook=shared_codebook,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 16))
    rvq.train() if train else rvq.eval()
    quantized, indices, _ = rvq(
        x, freeze_codebook=train and not implicit_neural_codebook
    )
    quantized_out = rvq.get_output_from_indices(indices)
    assert jnp.allclose(quantized, quantized_out, atol=1e-5)


def test_residual_vq_stochastic_shared():
    rvq = ResidualVQ(
        dim=32, num_quantizers=4, codebook_size=64,
        stochastic_sample_codes=True, sample_codebook_temp=0.1,
        shared_codebook=True, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 32))
    quantized, indices, commit_loss = rvq(x)
    assert quantized.shape == x.shape
    assert indices.shape == (1, 128, 4)
    assert commit_loss.shape == (4,)


def test_residual_vq_kmeans_init():
    rvq = ResidualVQ(
        dim=32, codebook_size=32, num_quantizers=4,
        kmeans_init=True, kmeans_iters=5, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 32))
    quantized, indices, _ = rvq(x)
    assert quantized.shape == x.shape


def test_residual_vq_non_uniform_codebook_sizes():
    """The 'tiger' test (reference test_readme.py:212-228)."""
    rvq = ResidualVQ(dim=2, codebook_size=(5, 16, 32), rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 2))
    rvq.train()
    quantized, indices, _ = rvq(x, freeze_codebook=True)
    quantized_out = rvq.get_output_from_indices(indices)
    assert jnp.allclose(quantized, quantized_out, atol=1e-5)


def test_residual_vq_quantize_dropout():
    rvq = ResidualVQ(
        dim=32, num_quantizers=8, codebook_size=64,
        quantize_dropout=True, quantize_dropout_cutoff_index=1,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    quantized, indices, _ = rvq(x)
    assert indices.shape == (1, 64, 8)
    # dropped layers are marked -1 uniformly across the batch
    per_layer = (indices == -1).all(axis=(0, 1)) | (indices != -1).all(axis=(0, 1))
    assert bool(per_layer.all())
    # decode from (possibly dropout-padded) indices
    out = rvq.get_output_from_indices(indices)
    assert out.shape == x.shape
    # coarse (truncated) indices also decode
    out = rvq.get_output_from_indices(indices[..., :3])
    assert out.shape == x.shape


def test_residual_vq_diveq():
    rvq = ResidualVQ(
        dim=32, num_quantizers=4, codebook_size=64, diveq=True,
        threshold_ema_dead_code=2, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    quantized, _, _ = rvq(x)
    assert quantized.shape == x.shape
    rvq.eval()
    quantized, _, _ = rvq(x)
    assert quantized.shape == x.shape


def test_residual_vq_ce_loss():
    rvq = ResidualVQ(dim=32, num_quantizers=4, codebook_size=64, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    rvq.eval()
    _, indices, _ = rvq(x)
    rvq.train()
    quantized, ce_loss = rvq(x, indices=indices)
    assert quantized.shape == x.shape
    assert jnp.isfinite(ce_loss)


def test_residual_vq_image_fmap():
    rvq = ResidualVQ(
        dim=16, num_quantizers=2, codebook_size=32,
        accept_image_fmap=True, rngs=nnx.Rngs(0),
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8, 8))
    quantized, indices, _ = rvq(img)
    assert quantized.shape == img.shape
    assert indices.shape == (1, 8, 8, 2)


def test_grouped_residual_vq():
    grvq = GroupedResidualVQ(
        dim=32, num_quantizers=4, groups=2, codebook_size=64, rngs=nnx.Rngs(0)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    quantized, indices, _ = grvq(x)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 1, 64, 4)

    grvq.eval()
    quantized, indices, _ = grvq(x)
    out = grvq.get_output_from_indices(indices)
    assert jnp.allclose(quantized, out, atol=1e-5)


# -- beam search (reference tests/test_beam.py) -------------------------------

def test_beam_size_one_matches_argmax():
    """topk=1 beam with frozen codebook must match the standard path
    exactly; post-hoc EMA must reproduce the standard codebook state
    bit-for-bit (reference test_beam.py:7-47)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))

    ref = ResidualVQ(dim=16, num_quantizers=4, codebook_size=32, rngs=nnx.Rngs(0))
    beam = ResidualVQ(dim=16, num_quantizers=4, codebook_size=32,
                      beam_size=1, rngs=nnx.Rngs(0))

    q1, i1, _ = ref(x)
    q2, i2, _ = beam(x)
    assert (i1 == i2).all()
    assert jnp.allclose(q1, q2, atol=1e-5)
    # EMA applied inside the standard path == post-hoc update_indices in the
    # beam path
    np.testing.assert_allclose(
        np.array(ref.codebooks), np.array(beam.codebooks), atol=1e-6
    )


def test_beam_search_smoke_with_dropout():
    rvq = ResidualVQ(
        dim=16, num_quantizers=4, codebook_size=32, beam_size=4,
        quantize_dropout=True, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    for _ in range(3):
        quantized, indices, loss = rvq(x)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 32, 4)
    assert loss.shape == (4,)


def test_beam_approx_topk_matches_exact():
    """`approx_topk=True` swaps the beam's per-layer candidate top-k
    (reference residual_vq.py:529-562 prune semantics) for
    `lax.approx_max_k`. At small codebooks the approximate reduction
    degenerates to the exact one (and the CPU lowering is exact), so the
    full beam output — indices, quantized, losses — must match the exact
    path bit-for-bit. This is the ranking-parity oracle; the measured TPU
    cost row lives in benchmarks/composites_tpu.py / BASELINE.md."""
    kw = dict(dim=16, num_quantizers=4, codebook_size=64, beam_size=4)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 16))
    exact = ResidualVQ(**kw, rngs=nnx.Rngs(0)).eval()
    approx = ResidualVQ(**kw, approx_topk=True, rngs=nnx.Rngs(0)).eval()
    q1, i1, l1 = exact(x)
    q2, i2, l2 = approx(x)
    assert (i1 == i2).all()
    assert (q1 == q2).all()
    assert (l1 == l2).all()


def test_beam_approx_topk_contract_wide_codebook():
    """At wide codebooks (where the approximation can actually bite) the
    contract is: valid in-range indices, decode round-trip, and finite
    training losses + EMA state."""
    rvq = ResidualVQ(dim=32, num_quantizers=3, codebook_size=1024,
                     beam_size=4, approx_topk=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32))
    quantized, indices, loss = rvq(x)          # training: post-hoc EMA path
    assert jnp.isfinite(loss).all()
    assert (indices >= 0).all() and (indices < 1024).all()
    rvq.eval()
    quantized, indices, _ = rvq(x)
    assert jnp.allclose(
        rvq.get_output_from_indices(indices), quantized, atol=1e-5
    )


def test_beam_search_improves_reconstruction():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    ref = ResidualVQ(dim=16, num_quantizers=4, codebook_size=32, rngs=nnx.Rngs(3)).eval()
    beam = ResidualVQ(dim=16, num_quantizers=4, codebook_size=32,
                      beam_size=8, rngs=nnx.Rngs(3)).eval()
    q1, *_ = ref(x)
    q2, *_ = beam(x)
    e1 = float(((q1 - x) ** 2).mean())
    e2 = float(((q2 - x) ** 2).mean())
    assert e2 <= e1 + 1e-6


# -- residual FSQ / LFQ / SimVQ -------------------------------------------------

def test_residual_fsq_round_trip_exact():
    rfsq = ResidualFSQ(
        dim=64, levels=[8, 5, 5, 3], num_quantizers=4, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
    quantized, indices = rfsq(x)
    out = rfsq.get_output_from_indices(indices)
    assert jnp.abs(quantized - out).max() < 1e-6


def test_grouped_residual_fsq():
    grfsq = GroupedResidualFSQ(
        dim=64, levels=[8, 5, 5, 3], num_quantizers=4, groups=2, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
    quantized, indices = grfsq(x)
    out = grfsq.get_output_from_indices(indices)
    assert jnp.abs(quantized - out).max() < 1e-6


def test_residual_lfq_round_trip_exact():
    rlfq = ResidualLFQ(
        dim=64, codebook_size=256, num_quantizers=4, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
    quantized, indices, _ = rlfq(x)
    out = rlfq.get_output_from_indices(indices)
    assert (quantized == out).all()


def test_grouped_residual_lfq():
    grlfq = GroupedResidualLFQ(
        dim=64, codebook_size=256, num_quantizers=2, groups=2, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64))
    quantized, indices, _ = grlfq(x)
    out = grlfq.get_output_from_indices(indices)
    assert (quantized == out).all()


def test_residual_sim_vq_channel_first():
    rsvq = ResidualSimVQ(
        dim=32, num_quantizers=4, codebook_size=64, channel_first=True,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8, 8))
    quantized, indices, _ = rsvq(x)
    assert quantized.shape == x.shape
    assert jnp.allclose(
        quantized, rsvq.get_output_from_indices(indices), atol=1e-5
    )


# -- hierarchical --------------------------------------------------------------

def test_hierarchical_vq():
    hq = HierarchicalVQ(
        dim=32, codebook_size=64, accept_image_fmap=True,
        scales=(1, 2, 4, 7), quant_resi=0.5, share_quant_resi=1,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 7, 7))
    quantized, indices, commit_loss = hq(x)
    reconstructed = hq.get_output_from_indices(indices)
    assert quantized.shape == x.shape
    assert reconstructed.shape == x.shape
    assert len(indices) == 4
    assert jnp.isfinite(commit_loss)


def test_adaptive_pool_matches_torch_semantics():
    import numpy as np
    from vqtpu.composite.hierarchical_vq import adaptive_avg_pool_2d
    # hand-checked: pooling 4 -> 2 averages pairs
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    out = adaptive_avg_pool_2d(x, (2, 2))
    expected = jnp.array([[[[2.5, 4.5], [10.5, 12.5]]]])
    assert jnp.allclose(out, expected)


# -- sequential ----------------------------------------------------------------

def test_sequential_routes_kwargs_to_quantizer():
    class Lin(nnx.Module):
        def __init__(self, i, o, rngs):
            self.l = nnx.Linear(i, o, rngs=rngs)

        def __call__(self, x):
            return self.l(x)

    model = Sequential(
        Lin(16, 32, nnx.Rngs(0)),
        VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0)),
        Lin(32, 16, nnx.Rngs(1)),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
    out, indices, loss = model(x, freeze_codebook=True)
    assert out.shape == (2, 8, 16)
    assert indices.shape == (2, 8)

    with pytest.raises(AssertionError):
        Sequential(Lin(4, 4, nnx.Rngs(0)))


def test_eval_beam_with_qinco_round_trip():
    # eval-mode beam + implicit neural codebook: the folded beam dim must
    # not be double-counted against the QINCo transform (regression: the
    # h-broadcast codebook reached the MLP and heads x batch exploded), and
    # the topk gather must handle the beam dim (the reference's eval beam
    # is broken upstream for both reasons)
    rvq = ResidualVQ(dim=16, num_quantizers=3, codebook_size=24,
                     implicit_neural_codebook=True, mlp_kwargs=dict(depth=1),
                     beam_size=2, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    rvq(x)
    rvq.eval()
    q, i, l = rvq(x)
    assert q.shape == x.shape and i.shape == (2, 12, 3)
    assert jnp.isfinite(q).all()
    dec = rvq.get_output_from_indices(i)
    assert jnp.allclose(dec, q, atol=1e-4)


@pytest.mark.parametrize('seed', range(3))
def test_batch_select_matches_numpy_oracle(seed):
    """_batch_select (one-hot contraction beam prune — the 23x fix) must
    be exact against a numpy gather oracle for float and int payloads,
    arbitrary trailing shapes."""
    import numpy as np
    from vqtpu.composite.residual_vq import _batch_select

    rng = np.random.default_rng(seed)
    b, n = int(rng.integers(1, 5)), int(rng.integers(1, 60))
    j = int(rng.integers(2, 20))
    k = int(rng.integers(1, j + 1))
    trail = tuple(rng.integers(1, 6, size=rng.integers(0, 3)))

    t = rng.standard_normal((b, n, j, *trail)).astype(np.float32)
    ti = rng.integers(-50, 50, size=(b, n, j, *trail)).astype(np.int32)
    idx = rng.integers(0, j, size=(b, n, k)).astype(np.int32)

    def oracle(arr):
        out = np.empty((b, n, k, *trail), arr.dtype)
        for a in range(b):
            for m in range(n):
                out[a, m] = arr[a, m][idx[a, m]]
        return out

    got = np.asarray(_batch_select(jnp.asarray(t), jnp.asarray(idx)))
    assert np.array_equal(got, oracle(t)), (b, n, j, k, trail)
    goti = np.asarray(_batch_select(jnp.asarray(ti), jnp.asarray(idx)))
    assert np.array_equal(goti, oracle(ti)), (b, n, j, k, trail, 'int')


def test_beam_score_precision_knob():
    """beam_score_precision=HIGHEST (the TPU determinism knob: forces the
    beam-score distance matmuls f32-faithful so on-chip rankings reproduce
    the CPU golden) must be plumbed to the layers' distance computation and
    must be a no-op on CPU, where f32 matmuls are already exact."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8))

    kw = dict(dim=8, num_quantizers=3, codebook_size=16, beam_size=4)
    ref = ResidualVQ(**kw, rngs=nnx.Rngs(0)).eval()
    det = ResidualVQ(**kw, beam_score_precision=jax.lax.Precision.HIGHEST,
                     rngs=nnx.Rngs(0)).eval()
    assert det.beam_score_precision == jax.lax.Precision.HIGHEST

    q1, i1, _ = ref(x)
    q2, i2, _ = det(x)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))

    # training-mode beam with the knob: post-hoc EMA state stays finite and
    # identical to the default-precision run on CPU
    t_ref = ResidualVQ(**kw, rngs=nnx.Rngs(1))
    t_det = ResidualVQ(**kw, beam_score_precision=jax.lax.Precision.HIGHEST,
                       rngs=nnx.Rngs(1))
    t_ref(x)
    t_det(x)
    np.testing.assert_array_equal(
        np.asarray(t_ref.codebooks), np.asarray(t_det.codebooks))


def test_residual_vq_train_fused_matches_standard():
    """train_fused rides **vq_kwargs into every ResidualVQ layer: training
    indices bit-match the standard path (incl. quantize-dropout's traced
    per-layer ema weights flowing into the fused statistics)."""
    import numpy as np

    def build(fused):
        return ResidualVQ(
            dim=16, num_quantizers=3, codebook_size=32, decay=0.8,
            train_fused='on' if fused else 'off', rngs=nnx.Rngs(0),
        )

    ref, fus = build(False), build(True)
    for s in range(3):
        x = jax.random.normal(jax.random.PRNGKey(s), (2, 24, 16))
        qr, ir, lr = ref(x)
        qf, if_, lf = fus(x)
        assert (np.asarray(ir) == np.asarray(if_)).all(), f'step {s}'
        np.testing.assert_allclose(
            np.asarray(qr), np.asarray(qf), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ref.layers[0]._codebook.embed[...]),
        np.asarray(fus.layers[0]._codebook.embed[...]), rtol=1e-6, atol=1e-5)


def test_residual_vq_shared_codebook_train_fused_matches_standard():
    """shared_codebook defers EMA application to after the layer loop (one
    drain of the accumulated statistics); the fused kernel's stats must
    accumulate identically."""
    import numpy as np

    def build(fused):
        return ResidualVQ(
            dim=16, num_quantizers=3, codebook_size=32, decay=0.8,
            shared_codebook=True,
            train_fused='on' if fused else 'off', rngs=nnx.Rngs(0),
        )

    ref, fus = build(False), build(True)
    for s in range(2):
        x = jax.random.normal(jax.random.PRNGKey(s), (2, 24, 16))
        _, ir, _ = ref(x)
        _, if_, _ = fus(x)
        assert (np.asarray(ir) == np.asarray(if_)).all(), f'step {s}'
    np.testing.assert_allclose(
        np.asarray(ref.layers[0]._codebook.embed[...]),
        np.asarray(fus.layers[0]._codebook.embed[...]), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref.layers[0]._codebook.cluster_size[...]),
        np.asarray(fus.layers[0]._codebook.cluster_size[...]),
        rtol=1e-6, atol=1e-5)
