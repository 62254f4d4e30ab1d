"""FSP tests, mirroring reference tests/test_fsp.py (CDF round trips, index
codec boundaries, determinism, layouts, dtype/grad matrix)."""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from vqtpu.quantizers import FSP
from vqtpu.quantizers.fsp import build_cdf_act


@pytest.mark.parametrize('act_name', ('tanh', 'sigmoid', 'normal', 'laplace', 'cauchy'))
def test_cdf_act_roundtrip(act_name):
    act_func, inv_act_func = build_cdf_act(act_name)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 10))
    y = act_func(x)
    x_hat = inv_act_func(y)
    assert (y > 0.0).all() and (y < 1.0).all()
    assert jnp.allclose(x, x_hat, atol=1e-4), (
        f'{act_name} roundtrip error: {jnp.abs(x_hat - x).max()}'
    )


def test_fsp_basic():
    fsp = FSP(levels=[8, 5, 5, 5], act_name='normal', vector_norm='none',
              rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 4))
    quantized, indices, norm_loss, other_info = fsp(x)
    assert quantized.shape == x.shape
    assert indices.shape == (1, 512)
    assert float(norm_loss) == 0.0
    assert isinstance(other_info, dict)


def test_fsp_eval_roundtrip():
    fsp = FSP(levels=[8, 5, 5, 5], rngs=nnx.Rngs(0)).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 4))
    quantized, indices, *_ = fsp(x)
    recovered = fsp.indices_to_codes(indices)
    assert jnp.allclose(quantized, recovered, atol=1e-5)


def test_fsp_index_encoding():
    fsp = FSP(levels=[8, 5, 5, 5], rngs=nnx.Rngs(0))

    level_indices = jnp.array([[[7, 4, 4, 4]]])
    flat_index = fsp.level_indices_to_indices(level_indices)
    # 7*1 + 4*8 + 4*40 + 4*200 = 999  (basis is little-endian: first dim
    # is the least significant digit)
    assert int(flat_index.ravel()[0]) == 999
    recovered = fsp.indices_to_level_indices(flat_index)
    assert (level_indices == recovered).all()

    zero = jnp.array([[[0, 0, 0, 0]]])
    flat_zero = fsp.level_indices_to_indices(zero)
    assert int(flat_zero.ravel()[0]) == 0
    assert (fsp.indices_to_level_indices(flat_zero) == zero).all()


def test_fsp_quantize_rate_one_deterministic():
    fsp = FSP(levels=[8, 5, 5, 5], quantize_rate=1.0, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 4))
    out1, *_ = fsp(x)
    out2, *_ = fsp(x)
    assert jnp.allclose(out1, out2)


def test_fsp_image_input():
    fsp = FSP(levels=[8, 5, 5, 5], dim=4, channel_first=True, rngs=nnx.Rngs(0)).eval()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8))
    quantized, indices, *_ = fsp(x)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 8, 8)
    recovered = fsp.indices_to_codes(indices)
    assert recovered.shape == x.shape
    assert jnp.allclose(quantized, recovered, atol=1e-5)


def test_fsp_with_dim_projection():
    fsp = FSP(levels=[8, 5, 5, 5], dim=64, rngs=nnx.Rngs(0)).eval()
    assert fsp.has_projections
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64))
    quantized, indices, _, _ = fsp(x)
    assert quantized.shape == x.shape
    assert indices.shape == (1, 64)
    recovered = fsp.indices_to_codes(indices)
    assert jnp.allclose(quantized, recovered, atol=1e-4)


@pytest.mark.parametrize('dtype', (jnp.float32, jnp.float16, jnp.bfloat16))
def test_fsp_dtypes_and_grad_flow(dtype):
    """Finite gradients at every precision (reference test_fsp.py:111-163)."""
    fsp = FSP(levels=[8, 5, 5, 5], dim=32, rngs=nnx.Rngs(0))

    def loss_fn(m, x):
        quantized, indices, norm_loss, _ = m(x)
        return quantized.astype(jnp.float32).sum() + norm_loss

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 32), dtype=dtype)
    quantized, indices, *_ = fsp(x)
    assert quantized.dtype == dtype or quantized.dtype == jnp.float32
    assert indices.dtype == jnp.int32
    assert (indices >= 0).all() and (indices < fsp.codebook_size).all()

    g = nnx.grad(loss_fn, argnums=1)(fsp, x)
    assert jnp.isfinite(g.astype(jnp.float32)).all()
