"""LFQ tests, mirroring reference tests/test_lfq.py (masking incl. all-False,
statistical CI test on the subsampled per-sample entropy) and
tests/test_readme.py:300-362."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vqtpu.quantizers import LFQ


@pytest.mark.parametrize('spherical', (True, False))
@pytest.mark.parametrize('codebook_scale', (1.0, 0.5))
def test_lfq_round_trip(spherical, codebook_scale):
    quantizer = LFQ(
        codebook_size=65536, dim=16, entropy_loss_weight=0.1,
        diversity_gamma=1.0, spherical=spherical,
        codebook_scale=codebook_scale, rngs=nnx.Rngs(0),
    )
    image_feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16))
    quantized, indices, entropy_aux_loss = quantizer(image_feats, inv_temperature=100.0)
    assert (quantized == quantizer.indices_to_codes(indices)).all()
    assert jnp.isfinite(entropy_aux_loss)


def test_lfq_seq_and_video_layouts():
    quantizer = LFQ(codebook_size=65536, dim=16, rngs=nnx.Rngs(0))
    seq = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16))
    quantized, *_ = quantizer(seq)
    assert seq.shape == quantized.shape

    video_feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 4, 16, 16))
    quantized, *_ = quantizer(video_feats)
    assert video_feats.shape == quantized.shape


def test_lfq_multi_codebook():
    quantizer = LFQ(codebook_size=4096, dim=16, num_codebooks=4, rngs=nnx.Rngs(0))
    image_feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16))
    quantized, indices, _ = quantizer(image_feats)
    assert image_feats.shape == quantized.shape
    assert (quantized == quantizer.indices_to_codes(indices)).all()


@pytest.mark.parametrize('frac_per_sample_entropy', (1.0, 0.5))
@pytest.mark.parametrize('mask_vals', ((False, False), (True, False), (True, True)))
def test_masked_lfq(frac_per_sample_entropy, mask_vals):
    quantizer = LFQ(
        codebook_size=65536, dim=16, entropy_loss_weight=0.1,
        diversity_gamma=1.0, frac_per_sample_entropy=frac_per_sample_entropy,
        rngs=nnx.Rngs(0),
    )
    image_feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16))
    mask = jnp.array(mask_vals)
    ret, _ = quantizer(
        image_feats, inv_temperature=100.0, return_loss_breakdown=True, mask=mask
    )
    quantized, indices, _ = ret
    assert (quantized == quantizer.indices_to_codes(indices)).all()


@pytest.mark.parametrize('mask_vals', (None, (True, False)))
def test_lfq_frac_per_sample_entropy_unbiased(mask_vals):
    """Subsampled per-sample entropy must fall inside a 95% CI of the exact
    value (reference tests/test_lfq.py:38-77)."""
    image_feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16))
    mask = None if mask_vals is None else jnp.array(mask_vals)

    full = LFQ(
        codebook_size=65536, dim=16, entropy_loss_weight=0.1,
        diversity_gamma=1.0, frac_per_sample_entropy=1.0, rngs=nnx.Rngs(0),
    )
    _, breakdown = full(
        image_feats, inv_temperature=100.0, return_loss_breakdown=True, mask=mask
    )
    true_per_sample_entropy = float(breakdown.per_sample_entropy)

    partial = LFQ(
        codebook_size=65536, dim=16, entropy_loss_weight=0.1,
        diversity_gamma=1.0, frac_per_sample_entropy=0.1, rngs=nnx.Rngs(0),
    )
    iters = 10
    losses = []
    for _ in range(iters):
        ret, breakdown = partial(
            image_feats, inv_temperature=100.0, return_loss_breakdown=True, mask=mask
        )
        quantized, indices, _ = ret
        assert (quantized == partial.indices_to_codes(indices)).all()
        losses.append(float(breakdown.per_sample_entropy))

    losses = np.array(losses)
    assert abs(losses.mean() - true_per_sample_entropy) < (
        1.96 * losses.std(ddof=1) / math.sqrt(iters)
    )


def test_lfq_entropy_loss_is_differentiable():
    quantizer = LFQ(codebook_size=256, dim=8, entropy_loss_weight=0.1,
                    commitment_loss_weight=0.25, rngs=nnx.Rngs(0))

    def loss_fn(m, x):
        quantized, indices, aux = m(x)
        return quantized.sum() * 0.0 + aux

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8))
    g = nnx.grad(loss_fn, argnums=1)(quantizer, x)
    assert jnp.isfinite(g).all() and (jnp.abs(g) > 0).any()


def test_lfq_spherical_bsq_normalized():
    quantizer = LFQ(codebook_size=256, dim=8, spherical=True, rngs=nnx.Rngs(0)).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8))
    quantized, *_ = quantizer(x)
    norms = jnp.linalg.norm(quantized, axis=-1)
    assert jnp.allclose(norms, quantizer.codebook_scale, atol=1e-4)


def test_lfq_straight_through_activation():
    # reference lookup_free_quantization.py:105,339-343 — custom activation
    # inside the straight-through estimator (training only)
    lfq = LFQ(codebook_size=16, dim=4, straight_through_activation=jnp.tanh,
              rngs=nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 4))

    def loss(z):
        q, ind, e = lfq(z)
        return (q ** 2).sum()

    g = jax.grad(loss)(z)
    assert jnp.isfinite(g).all() and (jnp.abs(g) > 0).any()
    # grads must be shaped by tanh': compare against identity-activation grads
    lfq_id = LFQ(codebook_size=16, dim=4, rngs=nnx.Rngs(0))

    def loss_id(z):
        q, ind, e = lfq_id(z)
        return (q ** 2).sum()

    g_id = jax.grad(loss_id)(z)
    assert not jnp.allclose(g, g_id)
    # eval path unaffected
    lfq.eval()
    q, ind, _ = lfq(z)
    assert (lfq.indices_to_codes(ind) == q).all()


@pytest.mark.parametrize('spherical', (False, True))
def test_lfq_chunked_entropy_matches_unchunked(spherical):
    """The streamed (chunked implicit codebook) entropy path must match the
    unchunked softmax path — loss values AND input gradients — since it is
    the exact same math with a streaming logsumexp (the (N, c, K) prob
    tensor is never materialized)."""
    kw = dict(codebook_size=2 ** 14, dim=14, num_codebooks=1,
              entropy_loss_weight=0.3, diversity_gamma=1.0,
              spherical=spherical)
    ref = LFQ(**kw, rngs=nnx.Rngs(0))
    chunked = LFQ(**kw, entropy_chunk_size=2 ** 11, rngs=nnx.Rngs(0))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 14))

    def loss_of(q, xs):
        quantized, _, aux = q(xs, inv_temperature=10.0)
        return aux + (quantized ** 2).mean()

    l_ref, g_ref = jax.value_and_grad(lambda xs: loss_of(ref, xs))(x)
    l_ch, g_ch = jax.value_and_grad(lambda xs: loss_of(chunked, xs))(x)

    np.testing.assert_allclose(float(l_ch), float(l_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_ch), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_lfq_chunked_entropy_with_mask_and_frac():
    """Chunking composes with masking and fractional per-sample-entropy
    subsampling (same rng stream -> same subsample -> same value)."""
    kw = dict(codebook_size=2 ** 12, dim=12,
              frac_per_sample_entropy=0.5, entropy_loss_weight=0.2)
    ref = LFQ(**kw, rngs=nnx.Rngs(3))
    chunked = LFQ(**kw, entropy_chunk_size=2 ** 9, rngs=nnx.Rngs(3))

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 12))
    mask = jnp.array([[True] * 10 + [False] * 6, [True] * 16])

    # inv_temperature=100 (the default) makes the logits O(100): the
    # streaming logsumexp's different rounding order is amplified through
    # exp, so parity here is ~1e-4 relative (values match to ~2e-5)
    _, _, aux_ref = ref(x, mask=mask)
    _, _, aux_ch = chunked(x, mask=mask)
    np.testing.assert_allclose(float(aux_ch), float(aux_ref), rtol=1e-4)


def test_lfq_large_codebook_auto_chunks():
    """K = 2^18: the auto policy must chunk (the unchunked path would
    materialize tokens x K probabilities) and produce finite, nonzero
    entropy terms under jit + grad."""
    q = LFQ(codebook_size=2 ** 18, dim=18, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 18))

    @jax.jit
    def step(xs):
        def f(v):
            quantized, _, aux = q(v, inv_temperature=1.0)
            return aux
        return jax.value_and_grad(f)(xs)

    aux, g = step(x)
    assert jnp.isfinite(aux) and jnp.isfinite(g).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize('spherical', (False, True))
def test_lfq_fused_entropy_matches_streamed(spherical):
    """The fused Pallas entropy sweeps (interpret mode on CPU) must match
    the chunked XLA path: aux loss and gradients to float-accumulation
    tolerance. (On-chip: 1.9x fwd / 1.5x train at K=2^18, BASELINE.md.)"""
    kw = dict(codebook_size=2 ** 10, dim=10, entropy_loss_weight=0.1,
              diversity_gamma=1.0, spherical=spherical,
              codebook_scale=0.5 if not spherical else 1.0,
              entropy_chunk_size=2 ** 8)
    streamed = LFQ(**kw, entropy_fused='off', rngs=nnx.Rngs(3))
    fused = LFQ(**kw, entropy_fused='on', rngs=nnx.Rngs(3))

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 20, 10))
    mask = jnp.array([[True] * 13 + [False] * 7, [True] * 20])

    def aux_of(m, it):
        def f(v):
            _, _, aux = m(v, mask=mask, inv_temperature=it)
            return aux
        return f

    # values at the default temperature (100): exact agreement
    a_s = aux_of(streamed, 100.0)(x)
    a_f = aux_of(fused, 100.0)(x)
    np.testing.assert_allclose(float(a_f), float(a_s), rtol=1e-4)

    # gradients at inv_temperature=1: the softmax VJP multiplies every
    # accumulation-order ulp by 2*inv_temperature, so the default temp
    # amplifies f32 noise to ~1e-3; at 1.0 the comparison is tight
    a_s, g_s = jax.value_and_grad(aux_of(streamed, 1.0))(x)
    a_f, g_f = jax.value_and_grad(aux_of(fused, 1.0))(x)
    np.testing.assert_allclose(float(a_f), float(a_s), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_s),
        atol=2e-5 * float(jnp.abs(g_s).max()),
    )


def test_lfq_fused_entropy_bwd_at_default_temp():
    """Backward parity at the DEFAULT inv_temperature=100 (the knob users
    actually train with). There the softmax saturates to ~one-hot: the
    analytic entropy gradient is ~0 and both paths emit O(eps*log eps)
    noise from which sub-eps probabilities flush to exact zero — so
    per-element RELATIVE comparison is meaningless (cos-sim ~0.7 between
    two equally-valid f32 evaluations). The meaningful contract is
    absolute: the value matches tightly and the gradient difference stays
    an order of magnitude below the rec-loss gradient scale (~1e-1 in the
    examples). Training-outcome equivalence is pinned by
    test_lfq_fused_entropy_training_trajectory."""
    kw = dict(codebook_size=2 ** 10, dim=10, entropy_loss_weight=0.1,
              diversity_gamma=1.0, entropy_chunk_size=2 ** 8)
    streamed = LFQ(**kw, entropy_fused='off', rngs=nnx.Rngs(3))
    fused = LFQ(**kw, entropy_fused='on', rngs=nnx.Rngs(3))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 20, 10))

    def aux_of(m):
        def f(v):
            _, _, aux = m(v, inv_temperature=100.0)
            return aux
        return f

    a_s, g_s = jax.value_and_grad(aux_of(streamed))(x)
    a_f, g_f = jax.value_and_grad(aux_of(fused))(x)
    np.testing.assert_allclose(float(a_f), float(a_s), rtol=1e-4)
    # measured max |diff| 1.5e-4 (CPU-deterministic); 5e-4 bound with margin
    assert float(jnp.abs(g_f - g_s).max()) < 5e-4


def test_lfq_fused_entropy_training_trajectory():
    """The evidence behind the `entropy_fused='auto'` default: a 200-step
    LFQ autoencoder run at the default inv_temperature must land at the
    same place with the fused sweeps as with the streamed statistics —
    final rec and aux losses within the 1% parity bar (measured deltas
    0.25% / 0.07%). Per-step gradient noise at the saturated temperature
    (see the bwd test above) does not alter training outcomes."""
    import optax

    def run(fused):
        class Model(nnx.Module):
            def __init__(self, rngs):
                self.enc = nnx.Linear(8, 10, rngs=rngs)
                self.lfq = LFQ(
                    codebook_size=2 ** 10, dim=10, entropy_chunk_size=2 ** 8,
                    entropy_loss_weight=0.1, diversity_gamma=1.0,
                    entropy_fused='on' if fused else 'off', rngs=rngs,
                )
                self.dec = nnx.Linear(10, 8, rngs=rngs)

            def __call__(self, x):
                q, _, aux = self.lfq(self.enc(x))
                return self.dec(q), aux

        model = Model(nnx.Rngs(0))
        opt = nnx.Optimizer(model, optax.adam(1e-3), wrt=nnx.Param)

        @nnx.jit
        def step(model, opt, x):
            def loss_fn(m):
                out, aux = m(x)
                rec = jnp.abs(out - x).mean()
                return rec + aux, (rec, aux)

            (_, (rec, aux)), grads = nnx.value_and_grad(
                loss_fn, has_aux=True)(model)
            opt.update(model, grads)
            return rec, aux

        recs, auxs = [], []
        for i in range(200):
            x = jax.random.normal(jax.random.PRNGKey(1000 + i), (32, 8, 8))
            rec, aux = step(model, opt, x)
            recs.append(float(rec))
            auxs.append(float(aux))
        return recs, auxs

    r_on, a_on = run(True)
    r_off, a_off = run(False)
    assert r_on[0] == r_off[0]                     # identical start
    assert np.mean(r_off[-20:]) < 0.75 * r_off[0]  # it actually trained
    rec_rel = abs(np.mean(r_on[-20:]) - np.mean(r_off[-20:])) \
        / np.mean(r_off[-20:])
    aux_rel = abs(np.mean(a_on[-20:]) - np.mean(a_off[-20:])) \
        / abs(np.mean(a_off[-20:]))
    assert rec_rel < 0.01, rec_rel
    assert aux_rel < 0.01, aux_rel


def test_lfq_fused_entropy_residual_scale():
    """codebook_scale != 1 (ResidualLFQ layers use 2^-q): the in-kernel
    generated codes must carry the right magnitude."""
    kw = dict(codebook_size=2 ** 8, dim=8, codebook_scale=0.25,
              entropy_loss_weight=0.05, entropy_chunk_size=2 ** 6)
    streamed = LFQ(**kw, entropy_fused='off', rngs=nnx.Rngs(0))
    fused = LFQ(**kw, entropy_fused='on', rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 8)) * 0.25
    _, _, a_s = streamed(x)
    _, _, a_f = fused(x)
    np.testing.assert_allclose(float(a_f), float(a_s), rtol=1e-4)


def test_lfq_fused_entropy_multi_codebook():
    """num_codebooks > 1: the fused path runs one sweep per codebook head
    and must match the streamed statistics."""
    kw = dict(codebook_size=2 ** 8, dim=16, num_codebooks=2,
              entropy_loss_weight=0.1, entropy_chunk_size=2 ** 6)
    streamed = LFQ(**kw, entropy_fused='off', rngs=nnx.Rngs(0))
    fused = LFQ(**kw, entropy_fused='on', rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 16))
    _, _, a_s = streamed(x)
    _, _, a_f = fused(x)
    np.testing.assert_allclose(float(a_f), float(a_s), rtol=1e-4)


def test_residual_lfq_fused_entropy_passthrough():
    """entropy_fused rides ResidualLFQ's **kwargs to every layer (each
    with its own codebook_scale = 2^-q in-kernel magnitude) and matches
    the streamed composite end-to-end."""
    from vqtpu.composite import ResidualLFQ
    kw = dict(dim=8, codebook_size=2 ** 8, num_quantizers=3,
              entropy_loss_weight=0.1, entropy_chunk_size=2 ** 6)
    streamed = ResidualLFQ(**kw, entropy_fused='off', rngs=nnx.Rngs(0))
    fused = ResidualLFQ(**kw, entropy_fused='on', rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 8))
    q_s, ind_s, loss_s = streamed(x)
    q_f, ind_f, loss_f = fused(x)
    assert (ind_s == ind_f).all()
    np.testing.assert_allclose(np.asarray(q_f), np.asarray(q_s), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loss_f), np.asarray(loss_s), rtol=1e-4)
