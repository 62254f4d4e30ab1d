"""Fused ResidualFSQ eval sweep (kernels/residual_fsq_fused.py) vs the
unrolled module loop.

Off-TPU the comparison bar is value-level, not bit-level: rebuilding the
same math in a different jit graph flips deep-layer bin-edge indices via
FMA contraction differences (measured and documented in BASELINE.md r5 —
layers at scale levels^-i quantize residual dust, and the decoded
reconstructions agree to one deepest-layer quantum). Early layers must
match exactly; on silicon the runbook pins bit-identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vqtpu.composite import GroupedResidualFSQ, ResidualFSQ
from vqtpu.kernels.residual_fsq_fused import fused_residual_fsq_eval


def _pair(levels, q, **kw):
    a = ResidualFSQ(levels=list(levels), num_quantizers=q,
                    eval_fused='off', rngs=nnx.Rngs(0), **kw)
    b = ResidualFSQ(levels=list(levels), num_quantizers=q,
                    eval_fused='on', rngs=nnx.Rngs(0), **kw)
    a.eval(), b.eval()
    return a, b


def _deepest_quantum(levels, q):
    lv = np.asarray(levels, np.float64)
    return float((2.0 / (lv - 1) * lv ** -(q - 1)).max())


@pytest.mark.parametrize(
    'levels, q',
    [((8, 5, 5, 5), 8),    # d=4, two index parts
     ((8, 6, 5), 3),       # d=3 -> padded to 4
     ((7, 5, 5, 5, 5), 6), # d=5 -> padded to 8
     ((4, 4), 2),
     ((8, 5, 5, 5), 3)],   # q < d
)
def test_fused_matches_unrolled(levels, q):
    loop, fused = _pair(levels, q)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 999, len(levels)))
    out_l, ind_l = loop(x)
    out_f, ind_f = fused(x)
    assert out_f.shape == out_l.shape and ind_f.shape == ind_l.shape
    assert ind_f.dtype == ind_l.dtype

    tol = 2 * _deepest_quantum(levels, q)
    assert float(jnp.abs(out_f - out_l).max()) <= tol
    # coarse layers must agree exactly; layers quantizing sub-1e-2-scale
    # residual dust may flip bin edges off-TPU (measured: flips start at
    # scale ~1.6e-3 on CPU, bit-exact on silicon)
    lv_min = min(levels)
    for i in range(q):
        scale = lv_min ** -i
        match = float((ind_f[..., i] == ind_l[..., i]).mean())
        if scale > 1e-2:
            assert match == 1.0, (i, match)
        else:
            assert match > 0.5, (i, match)
    # both index sets decode to the same reconstruction
    dec_l = loop.get_output_from_indices(ind_l)
    dec_f = loop.get_output_from_indices(ind_f)
    assert float(jnp.abs(dec_f - dec_l).max()) <= tol


def test_fused_kernel_direct_padding_and_leading_dims():
    levels, q = (8, 6, 5), 4
    m = ResidualFSQ(levels=list(levels), num_quantizers=q,
                    eval_fused='off', rngs=nnx.Rngs(0))
    m.eval()
    # odd token count exercises the row padding; 1-D leading shape
    x = jax.random.normal(jax.random.PRNGKey(1), (1234, 3))
    out_l, ind_l = m(x[None])
    out_f, ind_f = fused_residual_fsq_eval(
        x, m._scales(), levels=tuple(levels),
        clamp=tuple(m.soft_clamp_input_value), num_quantizers=q,
        block_rows=8, interpret=True)
    tol = 2 * _deepest_quantum(levels, q)
    assert float(jnp.abs(out_f - out_l[0]).max()) <= tol
    assert float((ind_f == ind_l[0]).mean()) > 0.99


def test_fused_not_used_in_training_or_auto_on_cpu(monkeypatch):
    import vqtpu.kernels.residual_fsq_fused as mod

    def boom(*a, **k):
        raise AssertionError('fused kernel must not be called')

    monkeypatch.setattr(mod, 'fused_residual_fsq_eval', boom)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))

    auto = ResidualFSQ(levels=[8, 5, 5, 5], num_quantizers=2,
                       rngs=nnx.Rngs(0))   # default 'auto', CPU -> loop
    auto.eval()
    auto(x)

    on_train = ResidualFSQ(levels=[8, 5, 5, 5], num_quantizers=2,
                           eval_fused='on', rngs=nnx.Rngs(0))
    on_train.train()
    on_train(x)                            # training -> loop


def test_fused_falls_back_on_ineligible_configs():
    # orthogonal_rotation and non-hard-clamp bounds keep the loop (and
    # must still run with eval_fused='on')
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))
    rot = ResidualFSQ(levels=[5, 5, 5, 5], num_quantizers=2,
                      eval_fused='on', orthogonal_rotation=True,
                      rngs=nnx.Rngs(0))
    rot.eval()
    ref = ResidualFSQ(levels=[5, 5, 5, 5], num_quantizers=2,
                      eval_fused='off', orthogonal_rotation=True,
                      rngs=nnx.Rngs(0))
    ref.eval()
    out_a, ind_a = rot(x)
    out_b, ind_b = ref(x)
    assert bool((out_a == out_b).all()) and bool((ind_a == ind_b).all())


def test_fused_channel_first_and_projection():
    levels, q = (8, 5, 5, 5), 4
    kw = dict(dim=16, is_channel_first=True)
    loop, fused = _pair(levels, q, **kw)
    # share the projection weights
    fused.project_in.kernel[...] = loop.project_in.kernel[...]
    fused.project_in.bias[...] = loop.project_in.bias[...]
    fused.project_out.kernel[...] = loop.project_out.kernel[...]
    fused.project_out.bias[...] = loop.project_out.bias[...]
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 8, 8))
    out_l, ind_l = loop(x)
    out_f, ind_f = fused(x)
    assert out_f.shape == out_l.shape == x.shape
    assert ind_f.shape == ind_l.shape
    assert float(jnp.abs(out_f - out_l).max()) <= 1e-4
    for i in range(2):  # coarse layers exact
        assert bool((ind_f[:, i] == ind_l[:, i]).all())


def test_grouped_passes_eval_fused_through():
    g = GroupedResidualFSQ(dim=8, groups=2, levels=[8, 5, 5, 5],
                           num_quantizers=3, eval_fused='on',
                           rngs=nnx.Rngs(0))
    g.eval()
    assert all(rvq.eval_fused == 'on' for rvq in g.rvqs)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 100, 8))
    quantized, indices = g(x)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 2, 100, 3)
    out = g.get_output_from_indices(indices)
    assert float(jnp.abs(out - quantized).max()) <= 1e-4
