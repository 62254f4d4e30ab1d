"""Checkpoint / state_dict round-trip tests (SURVEY.md §5.4: the reference's
persistence semantics ride nn.Module state_dict; its tests/test_beam.py:19
depends on load_state_dict round-tripping EMA state bit-for-bit)."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from vqtpu import VectorQuantize, ResidualVQ, SimVQ, LatentQuantize
from vqtpu.utils import (
    state_dict, load_state_dict, save_checkpoint, restore_checkpoint,
)


def _roundtrip_state_dict(make, x):
    m1 = make(0)
    m1(x)  # move EMA / stateful parts
    d = state_dict(m1)
    m2 = make(123)  # different init
    load_state_dict(m2, d)
    m1.eval()
    m2.eval()
    o1 = m1(x)
    o2 = m2(x)
    for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_vq_state_dict_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))
    _roundtrip_state_dict(
        lambda s: VectorQuantize(dim=8, codebook_size=16, decay=0.8,
                                 threshold_ema_dead_code=2, rngs=nnx.Rngs(s)),
        x,
    )


def test_residual_vq_state_dict_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 8))
    _roundtrip_state_dict(
        lambda s: ResidualVQ(dim=8, num_quantizers=3, codebook_size=16,
                             rngs=nnx.Rngs(s)),
        x,
    )


def test_simvq_state_dict_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 8))
    _roundtrip_state_dict(
        lambda s: SimVQ(dim=8, codebook_size=16, rngs=nnx.Rngs(s)), x,
    )


def test_latent_quantize_state_dict_roundtrip():
    # LatentQuantize input is channel-first (b, d, n)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 10))
    _roundtrip_state_dict(
        lambda s: LatentQuantize(levels=[5, 5, 8], dim=9, rngs=nnx.Rngs(s)),
        x,
    )


def test_orbax_checkpoint_roundtrip():
    vq = VectorQuantize(dim=8, codebook_size=16, decay=0.8, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))
    vq(x)
    vq.eval()
    q1, i1, _ = vq(x)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, 'ckpt')
        save_checkpoint(p, vq)
        vq2 = VectorQuantize(dim=8, codebook_size=16, decay=0.8,
                             rngs=nnx.Rngs(42))
        restore_checkpoint(p, vq2)
        vq2.eval()
        q2, i2, _ = vq2(x)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert (np.asarray(q1) == np.asarray(q2)).all()


def test_checkpoint_resumes_training_trajectory():
    # train 3 steps; checkpoint; train 2 more on both original and restored
    # module -> identical codebooks (EMA state fully captured)
    def steps(vq, xs):
        for x in xs:
            vq(x)

    key = jax.random.PRNGKey(7)
    xs = [jax.random.normal(jax.random.fold_in(key, i), (4, 10, 8))
          for i in range(5)]
    vq = VectorQuantize(dim=8, codebook_size=16, decay=0.8, rngs=nnx.Rngs(0))
    steps(vq, xs[:3])
    d = state_dict(vq)
    vq_resumed = VectorQuantize(dim=8, codebook_size=16, decay=0.8,
                                rngs=nnx.Rngs(9))
    load_state_dict(vq_resumed, d)
    steps(vq, xs[3:])
    steps(vq_resumed, xs[3:])
    a = np.asarray(vq._codebook.embed[...])
    b = np.asarray(vq_resumed._codebook.embed[...])
    assert (a == b).all()
