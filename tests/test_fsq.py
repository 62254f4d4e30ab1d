"""FSQ tests, mirroring reference tests/test_readme.py:254-298 plus codec
boundary checks."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from vqtpu.quantizers import FSQ


@pytest.mark.parametrize('preserve_symmetry', (True, False))
@pytest.mark.parametrize('bound_hard_clamp', (True, False))
def test_fsq_round_trip(preserve_symmetry, bound_hard_clamp):
    levels = [8, 5, 5, 5]
    quantizer = FSQ(
        levels, preserve_symmetry=preserve_symmetry,
        bound_hard_clamp=bound_hard_clamp, rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 4))
    xhat, indices = quantizer(x)
    assert (xhat == quantizer.indices_to_codes(indices)).all()


def test_fsq_without_indices():
    quantizer = FSQ([8, 5, 5, 5], return_indices=False, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 4))
    xhat, indices = quantizer(x)
    assert indices is None


def test_fsq_index_codec_covers_codebook():
    quantizer = FSQ([8, 5, 5], rngs=nnx.Rngs(0))
    all_indices = jnp.arange(quantizer.codebook_size)
    codes = quantizer._indices_to_codes(all_indices)
    back = quantizer.codes_to_indices(codes)
    assert (back == all_indices).all()


def test_fsq_implicit_codebook_unique():
    quantizer = FSQ([4, 3], rngs=nnx.Rngs(0))
    cb = quantizer.implicit_codebook
    assert cb.shape == (12, 2)
    # all codes distinct
    diffs = jnp.abs(cb[:, None, :] - cb[None, :, :]).sum(-1)
    off_diag = diffs + jnp.eye(12) * 1e9
    assert (off_diag > 1e-6).all()


def test_fsq_image_layout():
    quantizer = FSQ([8, 6, 5], dim=16, rngs=nnx.Rngs(0))
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8, 8))
    xhat, indices = quantizer(img)
    assert xhat.shape == img.shape
    assert indices.shape == (2, 8, 8)
    rec = quantizer.indices_to_codes(indices)
    assert jnp.allclose(xhat, rec, atol=1e-5)


def test_fsq_multi_codebook():
    quantizer = FSQ([8, 5, 5], num_codebooks=2, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 6))
    xhat, indices = quantizer(x)
    assert indices.shape == (1, 64, 2)
    assert (xhat == quantizer.indices_to_codes(indices)).all()


def test_fsq_orthogonal_rotation_round_trip():
    quantizer = FSQ(
        [5, 5, 5, 5], orthogonal_rotation=True, rngs=nnx.Rngs(0)
    ).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 4))
    xhat, indices = quantizer(x)
    assert jnp.allclose(xhat, quantizer.indices_to_codes(indices), atol=1e-5)


def test_fsq_noise_dropout_trains_but_evals_clean():
    quantizer = FSQ(
        [8, 5, 5], preserve_symmetry=True, noise_dropout=0.5, rngs=nnx.Rngs(0)
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 3))
    out1, _ = quantizer(x)
    out2, _ = quantizer(x)
    assert not jnp.allclose(out1, out2)     # stochastic in training
    quantizer.eval()
    out1, _ = quantizer(x)
    out2, _ = quantizer(x)
    assert (out1 == out2).all()


def test_fsq_grad_flow():
    quantizer = FSQ([8, 5, 5, 5], dim=32, rngs=nnx.Rngs(0))

    def loss_fn(m, x):
        out, _ = m(x)
        return (out ** 2).sum()

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 32))
    g = nnx.grad(loss_fn, argnums=1)(quantizer, x)
    assert jnp.isfinite(g).all() and (jnp.abs(g) > 0).any()


def test_fsq_allowed_dtypes_keeps_whitelisted_dtype():
    # reference finite_scalar_quantization.py:72,276-301 — the f32-forcing
    # region is skipped for whitelisted input dtypes
    fsq = FSQ(levels=[8, 5, 5], allowed_dtypes=('float32', 'bfloat16'),
              rngs=nnx.Rngs(0))
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 3)).astype(jnp.bfloat16)
    q, ind = fsq(z)
    assert q.dtype == jnp.bfloat16
    # default: non-whitelisted bf16 goes through f32 and is cast back
    fsq_d = FSQ(levels=[8, 5, 5], rngs=nnx.Rngs(0))
    qd, _ = fsq_d(z)
    assert qd.dtype == jnp.bfloat16
