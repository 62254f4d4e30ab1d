"""VectorQuantize behavior tests, mirroring the reference suite
(/root/reference/tests/test_readme.py — round-trip, masking, EMA
observability oracles) plus jit/grad coverage the reference lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from vqtpu.quantizers.vq import VectorQuantize


@pytest.mark.parametrize('use_cosine_sim', (True, False))
@pytest.mark.parametrize('rotation_trick', (True, False))
def test_vq(use_cosine_sim, rotation_trick):
    vq = VectorQuantize(
        dim=64, codebook_size=128, decay=0.8, commitment_weight=1.0,
        use_cosine_sim=use_cosine_sim, rotation_trick=rotation_trick,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 64))
    quantized, indices, commit_loss = vq(x)
    assert quantized.shape == x.shape
    assert indices.shape == (1, 256)
    assert jnp.isfinite(commit_loss)


def test_vq_eval_round_trip():
    vq = VectorQuantize(
        dim=64, codebook_size=128, decay=0.8, commitment_weight=1.0,
        rngs=nnx.Rngs(0),
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 64))
    quantized, indices, _ = vq(x)
    assert jnp.allclose(quantized, vq.get_output_from_indices(indices), atol=1e-5)


def test_vq_mask_equals_sliced():
    """Masked forward over the full sequence must agree with an unmasked
    forward over the valid prefix (reference test_vq_mask)."""
    vq = VectorQuantize(
        dim=64, codebook_size=128, decay=1.0, commitment_weight=1.0,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 64))
    lens = jnp.full((1,), 128)

    quantized, indices, commit_loss = vq(x[:, :128])
    mask_quantized, mask_indices, mask_commit_loss = vq(x, lens=lens)

    assert jnp.allclose(commit_loss, mask_commit_loss, atol=1e-5)
    assert jnp.allclose(quantized, mask_quantized[:, :128], atol=1e-5)
    assert (indices == mask_indices[:, :128]).all()
    assert (mask_quantized[:, 128:] == 0.0).all()
    assert (mask_indices[:, 128:] == -1).all()


def test_vq_lower_codebook_dim():
    vq = VectorQuantize(dim=64, codebook_size=64, codebook_dim=16, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
    quantized, indices, _ = vq(x)
    assert quantized.shape == x.shape


def test_vq_cosine_sim():
    vq = VectorQuantize(dim=64, codebook_size=64, use_cosine_sim=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
    quantized, indices, _ = vq(x)
    assert quantized.shape == x.shape


def test_vq_expire_code():
    vq = VectorQuantize(
        dim=64, codebook_size=128, threshold_ema_dead_code=2, rngs=nnx.Rngs(0)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 64))
    quantized, indices, _ = vq(x)
    assert quantized.shape == x.shape


def test_vq_multiheaded():
    vq = VectorQuantize(
        dim=32, codebook_dim=8, heads=4, separate_codebook_per_head=True,
        codebook_size=64, accept_image_fmap=True, rngs=nnx.Rngs(0),
    )
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8, 8))
    quantized, indices, _ = vq(img)
    assert quantized.shape == img.shape
    assert indices.shape == (1, 8, 8, 4)


def test_vq_multiheaded_shared_codebook_round_trip():
    vq = VectorQuantize(
        dim=32, codebook_dim=8, heads=4, codebook_size=64, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    quantized, indices, _ = vq(x)
    assert indices.shape == (2, 16, 4)
    assert jnp.allclose(quantized, vq.get_output_from_indices(indices), atol=1e-5)


def test_vq_3d_fmap():
    vq = VectorQuantize(
        dim=16, codebook_size=64, accept_3d_fmap=True, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 8, 8, 8))
    quantized, indices, _ = vq(x)
    assert quantized.shape == x.shape
    assert indices.shape == (1, 8, 8, 8)
    assert jnp.allclose(quantized, vq.get_output_from_indices(indices), atol=1e-5)


def test_vq_channel_first():
    vq = VectorQuantize(
        dim=32, codebook_size=64, channel_last=False, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48))
    quantized, indices, _ = vq(x)
    assert quantized.shape == x.shape
    assert jnp.allclose(quantized, vq.get_output_from_indices(indices), atol=1e-5)


def test_vq_single_token():
    vq = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    quantized, indices, _ = vq(x)
    assert quantized.shape == (4, 32)
    assert indices.shape == (4,)


@pytest.mark.parametrize('use_cosine_sim', (False, True))
@pytest.mark.parametrize('use_callable', (False, True))
def test_vq_custom_ema_update_weighting(use_cosine_sim, use_callable):
    """Exactly the weighted rows must move (reference
    test_vq_custom_ema_update_weighting)."""
    vq = VectorQuantize(
        dim=64, use_cosine_sim=use_cosine_sim, codebook_dim=32, codebook_size=8,
        decay=0.8, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128, 64))
    before = np.array(vq.codebook)

    weights = jnp.array([1.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0])
    weight_arg = (lambda es, cs: weights) if use_callable else weights

    vq(x, ema_update_weight=weight_arg)

    after = np.array(vq.codebook)
    did = np.asarray(weights).astype(bool)
    assert np.allclose(before[~did], after[~did], atol=1e-6)
    assert (before[did] != after[did]).all()


def test_accum_ema_update():
    """Accumulate-then-apply semantics (reference test_accum_ema_update)."""
    vq = VectorQuantize(
        dim=64, use_cosine_sim=True, codebook_dim=32, codebook_size=8,
        decay=0.8, commitment_weight=1.0, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128, 64))
    before = np.array(vq.codebook)

    vq(x, accum_ema_update=True)
    vq(x, accum_ema_update=True)
    assert np.allclose(before, np.array(vq.codebook), atol=1e-6)

    vq(x)
    assert not np.allclose(before, np.array(vq.codebook), atol=1e-6)


def test_vq_kmeans_init_under_jit():
    vq = VectorQuantize(
        dim=32, codebook_size=64, kmeans_init=True, kmeans_iters=5, rngs=nnx.Rngs(0)
    )
    assert not bool(vq._codebook.initted[...])

    @nnx.jit
    def step(vq, x):
        return vq(x)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 32))
    step(vq, x)
    assert bool(vq._codebook.initted[...])
    embed_after_init = np.array(vq.codebook)
    step(vq, jax.random.normal(jax.random.PRNGKey(1), (1, 256, 32)))
    # second step must not re-init (embed evolves by EMA, not kmeans reset)
    assert not np.allclose(embed_after_init, np.array(vq.codebook))


def test_vq_learnable_codebook_inplace_optimizer():
    vq = VectorQuantize(
        dim=32, codebook_size=64, learnable_codebook=True, ema_update=False,
        in_place_codebook_optimizer=optax.sgd(1e-2), rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 32))
    before = np.array(vq.codebook)
    _, _, _, breakdown = vq(x, return_loss_breakdown=True)
    assert float(breakdown.inplace_optimize) > 0
    assert not np.allclose(before, np.array(vq.codebook))


def test_vq_ce_loss_on_given_indices():
    vq = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    _, indices, _ = vq(x)
    quantized, ce_loss = vq(x, indices=indices)
    assert quantized.shape == x.shape
    assert jnp.isfinite(ce_loss)


def test_vq_freeze_codebook():
    vq = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    before = np.array(vq.codebook)
    vq(x, freeze_codebook=True)
    assert np.allclose(before, np.array(vq.codebook))


def test_vq_losses_and_estimators():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))

    vq = VectorQuantize(
        dim=32, codebook_size=64,
        codebook_diversity_loss_weight=1.0,
        orthogonal_reg_weight=1.0,
        orthogonal_reg_active_codes_only=True,
        orthogonal_reg_max_codes=16,
        rngs=nnx.Rngs(0),
    )
    _, _, loss, breakdown = vq(x, return_loss_breakdown=True)
    assert jnp.isfinite(loss)
    assert jnp.isfinite(breakdown.codebook_diversity)
    assert jnp.isfinite(breakdown.orthogonal_reg)

    vq = VectorQuantize(
        dim=32, codebook_size=64, directional_reparam=True,
        threshold_ema_dead_code=2, rngs=nnx.Rngs(0),
    )
    q, _, _ = vq(x)
    assert q.shape == x.shape

    vq = VectorQuantize(
        dim=32, codebook_size=64, stochastic_sample_codes=True,
        sample_codebook_temp=0.5, straight_through=True, rotation_trick=False,
        rngs=nnx.Rngs(0),
    )
    q, _, _ = vq(x)
    assert q.shape == x.shape


def test_vq_grad_flows_to_input():
    vq = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))

    def loss_fn(m, xx):
        q, _, loss = m(xx)
        return (q ** 2).mean() + loss

    g = nnx.grad(loss_fn, argnums=1)(vq, x)
    assert jnp.isfinite(g).all()
    assert (jnp.abs(g) > 0).any()


def test_vq_update_indices_posthoc_ema():
    vq = VectorQuantize(dim=32, codebook_size=8, decay=0.8, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32))
    _, indices, _ = vq(x, freeze_codebook=True)
    before = np.array(vq.codebook)
    vq.update_indices(x, indices)
    assert not np.allclose(before, np.array(vq.codebook))


def test_sync_codebook_alias_maps_to_sync_axis():
    # reference vector_quantize_pytorch.py:835,925-926
    vq = VectorQuantize(dim=8, codebook_size=16, sync_codebook='repl',
                        rngs=nnx.Rngs(0))
    assert vq._codebook.sync_axis == 'repl'
    vq2 = VectorQuantize(dim=8, codebook_size=16, sync_codebook=True,
                         rngs=nnx.Rngs(0))
    assert vq2._codebook.sync_axis == 'data'
    vq3 = VectorQuantize(dim=8, codebook_size=16, rngs=nnx.Rngs(0))
    assert vq3._codebook.sync_axis is None


def test_vq_bridge_transformer_over_codebook():
    # FVQ: a learnable module transforms the codebook before distance/lookup
    # (reference vector_quantize_pytorch.py:716-717; tests/test_readme.py:512-539
    # uses an external ViT; any nnx module with matching dims works)
    from flax import nnx as _nnx

    class Bridge(_nnx.Module):
        def __init__(self, dim, rngs):
            self.lin = _nnx.Linear(dim, dim, rngs=rngs)

        def __call__(self, embed):
            return self.lin(embed)

    rngs = nnx.Rngs(0)
    bridge = Bridge(16, rngs)
    vq = VectorQuantize(dim=16, codebook_size=32, vq_bridge=bridge, rngs=rngs)
    assert vq.learnable_codebook and not vq.ema_update

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))

    def loss_fn(m):
        q, ind, loss = m(x)
        return (q ** 2).sum() + loss

    grads = nnx.grad(loss_fn)(vq)
    # gradient must flow into the bridge parameters (that's the point of FVQ)
    gleaves = jax.tree.leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in gleaves)

    # decode semantics match the reference: get_codes_from_indices returns
    # RAW codebook rows (the bridge is a forward-time transform only,
    # reference vector_quantize_pytorch.py:983-1019 uses the raw embed)
    vq.eval()
    q, ind, _ = vq(x)
    dec = vq.get_codes_from_indices(ind)
    raw = vq.codebook[ind]
    assert jnp.allclose(dec, raw, atol=1e-6)
    # the forward output is the BRIDGED row for the same index
    bridged = bridge(vq.codebook)[ind]
    assert jnp.allclose(q, bridged, atol=1e-5)


def test_vq_channel_first_with_mask():
    # the reference crashes outright on channel_last=False + mask
    # (vector_quantize_pytorch.py:1319 compares mismatched layouts); we
    # support it: padding -> zeros in (b, d, n), indices -> -1
    vq = VectorQuantize(dim=8, codebook_size=16, channel_last=False,
                        rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 10))
    mask = jnp.array([[True] * 6 + [False] * 4, [True] * 10])
    q, i, l = vq(x, mask=mask)
    assert q.shape == x.shape and i.shape == (2, 10)
    assert (i[0, 6:] == -1).all() and (q[0, :, 6:] == 0).all()
    # masked forward == sliced forward on the prefix (eval)
    vq.eval()
    qm, im, _ = vq(x, mask=mask)
    qs, is_, _ = vq(x[:1, :, :6])
    assert jnp.allclose(qm[0, :, :6], qs[0], atol=1e-5)
    assert (im[0, :6] == is_[0]).all()


def test_vq_layernorm_after_project_in():
    vq = VectorQuantize(dim=32, codebook_size=16, codebook_dim=8,
                        layernorm_after_project_in=True, rngs=nnx.Rngs(0))
    assert vq.project_in_norm is not None
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    q, i, l = vq(x)
    vq.eval()
    q, i, _ = vq(x)
    assert jnp.allclose(vq.get_output_from_indices(i), q, atol=1e-5)


def test_vq_masked_padding_returns_orig_input():
    vq = VectorQuantize(dim=8, codebook_size=16,
                        return_zeros_for_masked_padding=False,
                        rngs=nnx.Rngs(0)).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    mask = jnp.array([[True] * 6 + [False] * 4, [True] * 10])
    q, i, l = vq(x, mask=mask)
    assert jnp.allclose(q[0, 6:], x[0, 6:])     # original input, not zeros
    assert (i[0, 6:] == -1).all()


def test_vq_manual_inplace_optimizer_update():
    vq = VectorQuantize(
        dim=8, codebook_size=16, learnable_codebook=True, ema_update=False,
        in_place_codebook_optimizer=optax.sgd(0.1),
        manual_in_place_optimizer_update=True, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    before = np.array(vq.codebook)
    vq(x)                       # grads accumulate, no apply
    assert np.allclose(before, np.array(vq.codebook))
    vq.update_in_place_optimizer()
    assert not np.allclose(before, np.array(vq.codebook))


def test_vq_manual_ema_update():
    # manual_ema_update: forward tracks stats but the embed only moves on an
    # explicit update_ema() call (reference manual_ema_update flag +
    # update_ema, vector_quantize_pytorch.py:576-584)
    vq = VectorQuantize(dim=8, codebook_size=16, decay=0.8,
                        manual_ema_update=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))
    before = np.array(vq.codebook)
    vq(x)
    assert np.allclose(before, np.array(vq.codebook))
    vq._codebook.update_ema()
    assert not np.allclose(before, np.array(vq.codebook))
    # matches the auto-update variant after one step
    vq2 = VectorQuantize(dim=8, codebook_size=16, decay=0.8, rngs=nnx.Rngs(0))
    vq2._codebook.embed.value = jnp.asarray(before[None])
    vq2._codebook.embed_avg.value = jnp.asarray(before[None])
    vq2._codebook.cluster_size.value = jnp.ones((1, 16))
    # align starting state: the manual vq also started from its own init
    # (same seed), so just compare the MOVED embeds
    vq2(x)
    np.testing.assert_allclose(
        np.array(vq.codebook), np.array(vq2.codebook), atol=1e-5)


# -- bf16 serving tier (module-level; kernel-level test lives in test_core) --

def _bf16_round(a):
    return jnp.asarray(a).astype(jnp.bfloat16).astype(jnp.float32)


def test_vq_bf16_tier_eval_exact_wrt_bf16_values():
    """`VectorQuantize(quantize_tier='bf16')` eval forward must return
    EXACTLY the bf16-cast codebook rows at the returned indices, and the
    indices must agree with the exact tier on the same (bf16-rounded)
    values except at floating-point near-ties (the tier's documented
    contract; kernels/distance.py:quantize_lookup)."""
    kw = dict(dim=32, codebook_size=64)
    vq = VectorQuantize(**kw, rngs=nnx.Rngs(0)).eval()
    vqb = VectorQuantize(quantize_tier='bf16', **kw, rngs=nnx.Rngs(0)).eval()

    e = _bf16_round(vq._codebook.embed[...])
    vq._codebook.embed.value = e
    vqb._codebook.embed.value = e
    x = _bf16_round(jax.random.normal(jax.random.PRNGKey(3), (2, 4096, 32)))

    q, idx, _ = vq(x)
    qb, idxb, _ = vqb(x)

    # lookup exactness: rows ARE the bf16 codebook rows (f32-cast, lossless)
    eb = np.asarray(e)[0]
    np.testing.assert_array_equal(
        np.asarray(qb), eb[np.asarray(idxb)])

    # selection parity vs the exact tier, near-ties excepted
    agree = np.asarray(idx == idxb)
    if not agree.all():
        assert agree.mean() > 0.999, agree.mean()
        d2 = ((np.asarray(x)[..., None, :] - eb) ** 2).sum(-1)
        picked = np.take_along_axis(
            d2, np.asarray(idxb)[..., None], axis=-1)[..., 0]
        best = np.take_along_axis(
            d2, np.asarray(idx)[..., None], axis=-1)[..., 0]
        gap = np.abs(picked - best)[~agree]
        assert (gap <= 1e-3 * np.abs(best[~agree]).max()).all(), gap.max()

    # decode on the tier: bf16 codebook rows, round-trips the forward
    dec = vqb.get_output_from_indices(idxb)
    np.testing.assert_array_equal(
        np.asarray(dec, dtype=np.float32), np.asarray(qb))


def test_vq_bf16_tier_training_runs_exact_path():
    """Training forwards and EMA statistics ALWAYS run the exact tier —
    a bf16-tier module must produce bit-identical post-step codebook state
    to an exact-tier module."""
    kw = dict(dim=16, codebook_size=32, decay=0.8)
    vq = VectorQuantize(**kw, rngs=nnx.Rngs(0))
    vqb = VectorQuantize(quantize_tier='bf16', **kw, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 64, 16))

    q, idx, loss = vq(x)
    qb, idxb, lossb = vqb(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idxb))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(qb))
    np.testing.assert_array_equal(
        np.asarray(vq.codebook), np.asarray(vqb.codebook))
    np.testing.assert_array_equal(
        np.asarray(vq._codebook.cluster_size[...]),
        np.asarray(vqb._codebook.cluster_size[...]))


def test_vq_bf16_tier_with_projection_and_heads():
    """The tier composes with project_in/out and multi-head codebooks
    (the vmap'd per-head bf16 pipeline)."""
    vq = VectorQuantize(
        dim=48, codebook_dim=16, codebook_size=64, heads=2,
        separate_codebook_per_head=True, quantize_tier='bf16',
        rngs=nnx.Rngs(0),
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 128, 48))
    q, idx, _ = vq(x)
    assert q.shape == x.shape and q.dtype == x.dtype
    assert idx.shape == (2, 128, 2)
    np.testing.assert_allclose(
        np.asarray(vq.get_output_from_indices(idx), np.float32),
        np.asarray(q), atol=1e-6)


def test_residual_vq_inherits_bf16_tier():
    """Composites forward **vq_kwargs, so the tier knob reaches every
    layer's codebook."""
    from vqtpu.composite.residual_vq import ResidualVQ

    rvq = ResidualVQ(
        dim=32, num_quantizers=3, codebook_size=64,
        quantize_tier='bf16', rngs=nnx.Rngs(0),
    ).eval()
    for layer in rvq.layers:
        assert layer._codebook.quantize_tier == 'bf16'
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 32))
    q, idx, _ = rvq(x)
    np.testing.assert_allclose(
        np.asarray(rvq.get_output_from_indices(idx)),
        np.asarray(q), atol=1e-5)


# -- fused training step at the module level (train_fused knob) ---------------

def _train_pair(steps=3, n=64, seq=33, **kw):
    """Run the same training stream through the XLA composition and the
    fused kernel (interpret mode off-TPU); return both modules + outputs."""
    ref = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0), **kw)
    fus = VectorQuantize(dim=32, codebook_size=64, train_fused='on',
                         rngs=nnx.Rngs(0), **kw)
    outs = []
    for s in range(steps):
        x = jax.random.normal(jax.random.PRNGKey(s), (n, seq, 32))
        outs.append((ref(x), fus(x)))
    return ref, fus, outs


@pytest.mark.parametrize('kw', [
    {},
    {'use_cosine_sim': True},
    {'heads': 2, 'separate_codebook_per_head': True, 'codebook_dim': 16},
    {'threshold_ema_dead_code': 0.0},        # no expiry branch
    {'affine_param': True},                  # stats post-transformed s·e+t·b
    {'kmeans_init': True, 'kmeans_iters': 3},  # lax.cond init before kernel
    {'threshold_ema_dead_code': 2.0},        # expiry draws after the kernel
], ids=['ema', 'cosine', 'heads', 'no-expiry', 'affine', 'kmeans',
        'expiry'])
def test_train_fused_matches_module(kw):
    """VectorQuantize(train_fused='on') reproduces the default training
    forward: indices and quantize bit-identical (the kernel's lookup is
    bit-exact), EMA state equal up to f32 accumulation order."""
    ref, fus, outs = _train_pair(**kw)
    for s, ((qr, ir, lr), (qf, if_, lf)) in enumerate(outs):
        assert (np.asarray(ir) == np.asarray(if_)).all(), f'step {s} indices'
        if s == 0:
            # identical codebooks: the kernel's lookup rows are bit-exact
            np.testing.assert_array_equal(
                np.asarray(qr), np.asarray(qf), err_msg=f'step {s} quantize')
        else:
            # EMA states differ by f32 accumulation order from step 1 on
            # (kernel block-partials vs einsum contraction — the documented
            # train_fused contract), so rows agree only to ulps
            np.testing.assert_allclose(
                np.asarray(qr), np.asarray(qf), rtol=1e-5, atol=1e-6,
                err_msg=f'step {s} quantize')
        np.testing.assert_allclose(
            np.asarray(lr), np.asarray(lf), atol=1e-6, err_msg=f'step {s}')
    np.testing.assert_array_equal(
        np.asarray(ref._codebook.cluster_size[...]),
        np.asarray(fus._codebook.cluster_size[...]))
    np.testing.assert_allclose(
        np.asarray(ref._codebook.embed_avg[...]),
        np.asarray(fus._codebook.embed_avg[...]), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref._codebook.embed[...]),
        np.asarray(fus._codebook.embed[...]), rtol=1e-6, atol=1e-5)


def test_train_fused_masked_matches_module():
    """Mask weighting flows into the kernel's statistics: padded tokens
    contribute nothing, matching the default masked path."""
    ref = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    fus = VectorQuantize(dim=32, codebook_size=64, train_fused='on',
                         rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 17, 32))
    lens = jnp.array([17, 5, 9, 0])
    mask = jnp.arange(17)[None, :] < lens[:, None]
    qr, ir, _ = ref(x, mask=mask)
    qf, if_, _ = fus(x, mask=mask)
    assert (np.asarray(ir) == np.asarray(if_)).all()
    np.testing.assert_array_equal(np.asarray(qr), np.asarray(qf))
    np.testing.assert_array_equal(
        np.asarray(ref._codebook.cluster_size[...]),
        np.asarray(fus._codebook.cluster_size[...]))
    np.testing.assert_allclose(
        np.asarray(ref._codebook.embed_avg[...]),
        np.asarray(fus._codebook.embed_avg[...]), rtol=1e-6, atol=1e-5)


def test_train_fused_falls_back_when_ineligible():
    """Feature combinations the kernel cannot serve (learnable codebook,
    affine stats, CE-loss distances) silently use the standard path and
    still train."""
    for kw in (
        {'learnable_codebook': True, 'ema_update': False},
        {'commitment_use_cross_entropy_loss': True, 'commitment_weight': 1.0},
    ):
        vq = VectorQuantize(dim=32, codebook_size=64, train_fused='on',
                            rngs=nnx.Rngs(0), **kw)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 32))
        q, ind, loss = vq(x)
        assert q.shape == x.shape and jnp.isfinite(loss)


def test_train_fused_under_jit_trains():
    """The fused step works under jit (nnx.jit state threading) and the
    codebook converges onto the data support."""
    vq = VectorQuantize(dim=8, codebook_size=16, decay=0.5,
                        train_fused='on', rngs=nnx.Rngs(0))

    @nnx.jit
    def step(vq, x):
        q, ind, _ = vq(x)
        return ((q - x) ** 2).mean()

    errs = [
        float(step(vq, jax.random.normal(jax.random.PRNGKey(s), (8, 64, 8))))
        for s in range(10)
    ]
    assert errs[-1] < errs[0]


def test_train_fused_under_value_and_grad():
    """The fused kernel must survive nnx.value_and_grad over a surrounding
    loss: its inputs carry encoder tangents, and pallas_call has no JVP rule
    — the module stops gradients at the kernel boundary (EMA semantics)."""
    class AE(nnx.Module):
        def __init__(self, rngs):
            self.enc = nnx.Linear(16, 8, rngs=rngs)
            self.vq = VectorQuantize(dim=8, codebook_size=32, decay=0.6,
                                     train_fused='on', rngs=rngs)
            self.dec = nnx.Linear(8, 16, rngs=rngs)

        def __call__(self, x):
            q, ind, loss = self.vq(self.enc(x))
            return self.dec(q), loss

    model = AE(nnx.Rngs(0))
    opt = nnx.Optimizer(model, optax.adam(1e-2), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            y, vq_loss = m(x)
            return ((y - x) ** 2).mean() + vq_loss
        l, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return l

    losses = [
        float(step(model, opt,
                   jax.random.normal(jax.random.PRNGKey(s), (1, 64, 16))))
        for s in range(25)
    ]
    assert losses[-1] < losses[0], losses


def test_train_fused_accum_ema_matches_standard():
    """Micro-batch accumulation (accum_ema_update) drains identically
    whether the statistics came from the fused kernel or the XLA einsums."""
    ref = VectorQuantize(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
    fus = VectorQuantize(dim=32, codebook_size=64, train_fused='on',
                         rngs=nnx.Rngs(0))
    xs = [jax.random.normal(jax.random.PRNGKey(s), (4, 16, 32))
          for s in range(3)]
    for m in (ref, fus):
        m(xs[0], accum_ema_update=True)
        m(xs[1], accum_ema_update=True)
        m(xs[2])                      # drains the accumulators
    np.testing.assert_allclose(
        np.asarray(ref._codebook.embed[...]),
        np.asarray(fus._codebook.embed[...]), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref._codebook.cluster_size[...]),
        np.asarray(fus._codebook.cluster_size[...]), rtol=1e-6, atol=1e-5)
    assert float(jnp.abs(fus._codebook.accum_embed_avg[...]).max()) == 0.0
