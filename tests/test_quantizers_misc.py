"""LatentQuantize / SimVQ / RandomProjectionQuantizer / BinaryMapper tests,
mirroring reference tests/test_latent_quantization.py and
tests/test_readme.py:199-210,403-415 plus binary_mapper.py:198-219."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from vqtpu.quantizers import (
    BinaryMapper,
    LatentQuantize,
    RandomProjectionQuantizer,
    SimVQ,
)


class TestLatentQuantize:
    def make(self, **kw):
        base = dict(
            levels=[5, 5, 8], dim=16,
            commitment_loss_weight=0.1, quantization_loss_weight=0.1,
            rngs=nnx.Rngs(0),
        )
        base.update(kw)
        return LatentQuantize(**base)

    @pytest.mark.parametrize('shape', (
        (1, 16, 32, 32),        # images
        (1, 16, 4, 16, 16),     # video
        (1, 16, 64),            # series
    ))
    def test_round_trip_layouts(self, shape):
        quantizer = self.make()
        feats = jax.random.normal(jax.random.PRNGKey(0), shape)
        quantized, indices, _ = quantizer(feats)
        assert feats.shape == quantized.shape
        assert (quantized == quantizer.indices_to_codes(indices)).all()

    def test_quantize_and_project_matches_forward(self):
        # the reference helper (latent_quantization.py:211-224) operates on
        # post-project_in tokens; its (codes, out, indices) must agree with
        # the eval forward path end-to-end.
        quantizer = self.make()
        quantizer.eval()
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8, 8))
        quantized, indices, _ = quantizer(feats)

        z = jnp.moveaxis(feats, 1, -1)
        ps = z.shape
        z = z.reshape(z.shape[0], -1, quantizer.dim)
        if quantizer.project_in is not None:
            z = quantizer.project_in(z)
        z = z.reshape(*z.shape[:-1], quantizer.num_codebooks,
                      quantizer.codebook_dim)

        codes, out, idx = quantizer.quantize_and_project(z, True, ps)
        assert codes.shape == (2, 64, quantizer.codebook_dim)
        assert (out == quantized).all()
        assert (idx == indices).all()

    def test_frozen_values(self):
        quantizer = self.make(optimize_values=False)
        feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 32))
        quantized, indices, _ = quantizer(feats)
        assert (quantized == quantizer.indices_to_codes(indices)).all()

    def test_int_levels(self):
        quantizer = self.make(levels=5, codebook_dim=3)
        feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 32))
        quantized, indices, _ = quantizer(feats)
        assert feats.shape == quantized.shape
        assert (quantized == quantizer.indices_to_codes(indices)).all()

    def test_int_levels_without_codebook_dim_raises(self):
        with pytest.raises(AssertionError):
            self.make(levels=5)

    def test_multi_codebook_and_grads(self):
        quantizer = self.make(num_codebooks=4)
        feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 64))
        quantized, indices, loss = quantizer(feats)
        assert feats.shape == quantized.shape
        assert indices.shape[-1] == 4
        assert (quantized == quantizer.indices_to_codes(indices)).all()

        def loss_fn(m, x):
            out, _, l = m(x)
            return out.sum() * 0.0 + l

        grads = nnx.grad(loss_fn)(quantizer, feats)
        assert all(
            bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads)
        )


class TestSimVQ:
    def test_round_trip(self):
        sim_vq = SimVQ(dim=64, codebook_size=128, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 64))
        quantized, indices, commit_loss = sim_vq(x)
        assert x.shape == quantized.shape
        assert jnp.allclose(quantized, sim_vq.indices_to_codes(indices), atol=1e-5)

    def test_channel_first(self):
        sim_vq = SimVQ(dim=32, codebook_size=64, channel_first=True, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8, 8))
        quantized, indices, _ = sim_vq(x)
        assert x.shape == quantized.shape
        assert indices.shape == (1, 8, 8)
        assert jnp.allclose(quantized, sim_vq.indices_to_codes(indices), atol=1e-5)

    def test_custom_transform(self):
        class MLP(nnx.Module):
            def __init__(self, rngs):
                self.l1 = nnx.Linear(32, 64, rngs=rngs)
                self.l2 = nnx.Linear(64, 32, rngs=rngs)

            def __call__(self, x):
                return self.l2(jax.nn.relu(self.l1(x)))

        sim_vq = SimVQ(
            dim=32, codebook_size=64,
            codebook_transform=MLP(nnx.Rngs(1)), rngs=nnx.Rngs(0),
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
        quantized, indices, _ = sim_vq(x)
        assert x.shape == quantized.shape

    def test_only_transform_gets_grads(self):
        sim_vq = SimVQ(dim=32, codebook_size=64, rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))

        def loss_fn(m, xx):
            q, _, commit = m(xx)
            return (q ** 2).mean() + commit

        grads = nnx.grad(loss_fn)(sim_vq, x)
        leaves = jax.tree.leaves(grads)
        assert len(leaves) >= 1
        assert any(bool((jnp.abs(g) > 0).any()) for g in leaves)
        # the frozen codebook is a Variable, not a Param: no grads for it
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        assert not any('frozen_codebook' in str(p) for p, _ in flat)


class TestRandomProjectionQuantizer:
    def test_indices_and_ce(self):
        quantizer = RandomProjectionQuantizer(
            dim=64, num_codebooks=4, codebook_dim=32, codebook_size=128,
            rngs=nnx.Rngs(0),
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 64))
        indices = quantizer(x)
        assert indices.shape == (1, 128, 4)
        assert (indices >= 0).all() and (indices < 128).all()

        ce_loss = quantizer(x, indices=indices)
        assert jnp.isfinite(ce_loss)

    def test_vq_stays_frozen(self):
        quantizer = RandomProjectionQuantizer(
            dim=16, num_codebooks=1, codebook_dim=8, codebook_size=32,
            rngs=nnx.Rngs(0),
        )
        quantizer.train()
        assert quantizer.vq.training is False
        import numpy as np
        before = np.array(quantizer.vq.codebook)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 16))
        quantizer(x)
        assert np.allclose(before, np.array(quantizer.vq.codebook))


class TestBinaryMapper:
    def test_shapes_and_log_prob(self):
        bm = BinaryMapper(bits=8, rngs=nnx.Rngs(0))
        logits = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8))
        one_hot, indices, aux = bm(logits, return_indices=True,
                                   reduce_aux_kl_loss=False)
        assert one_hot.shape == (3, 4, 256)
        assert indices.shape == (3, 4)
        assert aux.shape == (3, 4)

        lp = bm.log_prob(logits, indices=indices)
        lp2 = bm.log_prob(logits, one_hot=one_hot)
        assert lp.shape == (3, 4)
        assert jnp.allclose(lp, lp2)

    def test_deterministic_eval(self):
        bm = BinaryMapper(bits=8, rngs=nnx.Rngs(0)).eval()
        logits = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 8))
        oh1, _ = bm(logits, deterministic=True)
        oh2, _ = bm(logits, deterministic=True)
        assert jnp.allclose(oh1, oh2)

    def test_aux_loss_hinge(self):
        bm = BinaryMapper(bits=4, kl_loss_threshold=100.0, rngs=nnx.Rngs(0))
        logits = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
        # kl can never exceed a huge threshold -> hinged loss is 0
        assert float(bm.calc_aux_loss(logits)) == 0.0

    def test_soft_g_straight_through_grads(self):
        bm = BinaryMapper(bits=4, rngs=nnx.Rngs(0))

        def loss_fn(m, logits):
            one_hot, aux = m(logits)
            return (one_hot * jnp.arange(16)).sum() + aux

        logits = jax.random.normal(jax.random.PRNGKey(0), (8, 4))
        g = nnx.grad(loss_fn, argnums=1)(bm, logits)
        assert jnp.isfinite(g).all() and (jnp.abs(g) > 0).any()


def test_latent_quantize_inplace_optimizer_moves_values():
    # our working implementation of the in-place inner optimizer for
    # LatentQuantize (the reference's equivalent path is broken upstream:
    # latent_quantization.py:264 reads a never-assigned attribute)
    import numpy as np
    import optax
    from vqtpu import LatentQuantize

    lq = LatentQuantize(levels=[5, 5, 8], dim=9,
                        in_place_codebook_optimizer=optax.sgd(0.1),
                        rngs=nnx.Rngs(0))
    before = [np.array(v[...]) for v in lq.values_per_latent]
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 10))
    q, ind, loss = lq(x)
    after = [np.array(v[...]) for v in lq.values_per_latent]
    moved = any((a != b).any() for a, b in zip(before, after))
    assert moved, 'inner optimizer step did not move the values'
    # eval round-trip still consistent after the inner step
    lq.eval()
    q, ind, _ = lq(x)
    assert jnp.isfinite(q).all()
