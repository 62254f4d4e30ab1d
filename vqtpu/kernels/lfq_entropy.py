"""Fused streaming LFQ entropy statistics for huge implicit codebooks.

The LFQ entropy aux loss needs, for every token, a softmax over ALL
K = 2^d implicit codes (reference lookup_free_quantization.py:345-403).
At K = 2^18 the (N, K) probability stream is ~8.6 GB and the XLA chunked
formulation (vqtpu/quantizers/lfq.py::_streamed_entropy_stats) is
HBM-bound: measured 50.7 ms per 8k-token training forward ≈ 4.4 full
HBM streams of the logits (BASELINE.md r4; a pure `exp(x).sum()` over the
same array measures 11.2 ms = 744 GB/s, so transcendentals are free —
the traffic is the cost).

This module fuses the whole computation into Pallas sweeps that never
materialize logits in HBM. The implicit codebook is GENERATED inside the
kernel (LFQ codes are ±v with one shared magnitude — spherical l2norm
rescales uniformly, reference :164-167 — so a code tile is a bit-pattern
iota times a scalar), meaning the only HBM traffic is x (N x d, ~600 KB)
plus the small outputs. Four sweeps:

  A: online logsumexp over code tiles               -> logZ (N,)
  B: entropy + weighted avg-prob accumulation       -> ent (N,), avgp (K,)
  C (bwd): sigma_n = sum_k p*g, gdot_n = sum_k p*Gbar   (softmax-VJP stats)
  D (bwd): dx_n = 2*inv_temp * sum_k p*(g - sigma) @ C

wired as a `jax.custom_vjp` so training takes the fused path end-to-end.
Matches the chunked XLA path to float-accumulation tolerance (~1e-6; the
tests pin both against each other and against jax.grad of the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HIGHEST = jax.lax.Precision.HIGHEST


def code_magnitude(codebook_dim: int, codebook_scale: float,
                   spherical: bool) -> float:
    """The shared |entry| of every implicit code, replicating the XLA
    path's arithmetic (bits*2s - s, then l2norm*s for spherical) in
    float32."""
    s = np.float32(codebook_scale)
    if not spherical:
        return float(s)
    norm = np.sqrt(np.float32(codebook_dim) * s * s, dtype=np.float32)
    return float(s / np.maximum(norm, np.float32(1e-6)) * s)


def _code_tile(i_k, block_k: int, d: int, v: float):
    """(d, block_k) tile of the implicit codebook, transposed: column k is
    code (i_k*block_k + k), rows are dims MSB-first (reference :206)."""
    idx = i_k * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (d, block_k), 1
    )
    j = jax.lax.broadcasted_iota(jnp.int32, (d, block_k), 0)
    bit = jnp.right_shift(idx, (d - 1) - j) & 1
    return jnp.where(bit == 1, jnp.float32(v), jnp.float32(-v))


def _logits(x_ref, i_k, block_k: int, d: int, v: float, inv_temp: float):
    ct = _code_tile(i_k, block_k, d, v)
    dot = jax.lax.dot_general(
        x_ref[...], ct, (((1,), (0,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32,
    )
    # mirror the XLA path's op order: distance = -2*dot; logits =
    # distance * -inv_temp (two separate multiplies, same rounding)
    return (dot * jnp.float32(-2.0)) * jnp.float32(-inv_temp)


def _kernel_a(x_ref, m_out, s_out, m_s, s_s, *, block_k, d, v, inv_temp):
    i_k = pl.program_id(1)

    @pl.when(i_k == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        s_s[...] = jnp.zeros_like(s_s)

    logits = _logits(x_ref, i_k, block_k, d, v, inv_temp)
    tile_max = logits.max(axis=1, keepdims=True)
    m_new = jnp.maximum(m_s[...], tile_max)
    s_s[...] = s_s[...] * jnp.exp(m_s[...] - m_new) + jnp.exp(
        logits - m_new
    ).sum(axis=1, keepdims=True)
    m_s[...] = m_new
    m_out[...] = m_new
    s_out[...] = s_s[...]


def _kernel_b(x_ref, w_ref, logz_ref, ent_out, avgp_out, ent_s,
              *, block_k, d, v, inv_temp, eps):
    i_k = pl.program_id(1)

    @pl.when(i_k == 0)
    def _():
        ent_s[...] = jnp.zeros_like(ent_s)

    logits = _logits(x_ref, i_k, block_k, d, v, inv_temp)
    p = jnp.exp(logits - logz_ref[...])
    ent_s[...] = ent_s[...] + (
        -p * jnp.log(jnp.maximum(p, jnp.float32(eps)))
    ).sum(axis=1, keepdims=True)
    ent_out[...] = ent_s[...]
    # Mosaic wants >=8 sublanes per output block: row 0 carries this
    # n-tile's partial, rows 1-7 are zero (summed away by the caller)
    colsum = (p * w_ref[...]).sum(axis=0, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, colsum.shape[1]), 0)
    avgp_out[...] = jnp.where(row == 0, colsum, jnp.float32(0.0))


def _kernel_c(x_ref, w_ref, logz_ref, entbar_ref, gbar_ref,
              sigma_out, gdot_out, sigma_s, gdot_s,
              *, block_k, d, v, inv_temp, eps):
    i_k = pl.program_id(1)

    @pl.when(i_k == 0)
    def _():
        sigma_s[...] = jnp.zeros_like(sigma_s)
        gdot_s[...] = jnp.zeros_like(gdot_s)

    logits = _logits(x_ref, i_k, block_k, d, v, inv_temp)
    p = jnp.exp(logits - logz_ref[...])
    pe = jnp.maximum(p, jnp.float32(eps))
    fprime = -jnp.log(pe) - (p > eps).astype(jnp.float32)
    g = entbar_ref[...] * fprime + w_ref[...] * gbar_ref[...]
    sigma_s[...] = sigma_s[...] + (p * g).sum(axis=1, keepdims=True)
    gdot_s[...] = gdot_s[...] + (p * gbar_ref[...]).sum(
        axis=1, keepdims=True
    )
    sigma_out[...] = sigma_s[...]
    gdot_out[...] = gdot_s[...]


def _kernel_d(x_ref, w_ref, logz_ref, entbar_ref, gbar_ref, sigma_ref,
              dx_out, dx_s, *, block_k, d, v, inv_temp, eps):
    i_k = pl.program_id(1)

    @pl.when(i_k == 0)
    def _():
        dx_s[...] = jnp.zeros_like(dx_s)

    logits = _logits(x_ref, i_k, block_k, d, v, inv_temp)
    p = jnp.exp(logits - logz_ref[...])
    pe = jnp.maximum(p, jnp.float32(eps))
    fprime = -jnp.log(pe) - (p > eps).astype(jnp.float32)
    g = entbar_ref[...] * fprime + w_ref[...] * gbar_ref[...]
    dl = p * (g - sigma_ref[...])                        # (bn, bk)
    ct = _code_tile(i_k, block_k, d, v)                  # (d, bk)
    dx_s[...] = dx_s[...] + jax.lax.dot_general(
        dl, ct, (((1,), (1,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32,
    ) * jnp.float32(2.0 * inv_temp)
    dx_out[...] = dx_s[...]


def _grid_specs(n_pad, k, d, block_n, block_k):
    grid = (n_pad // block_n, k // block_k)
    x_spec = pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block_n, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    return grid, x_spec, col_spec


def _interpret_default() -> bool:
    return jax.default_backend() != 'tpu'


@functools.partial(
    jax.jit,
    static_argnames=('k', 'v', 'inv_temp', 'eps', 'block_n', 'block_k',
                     'interpret'),
)
def _fwd_pass(x, w, *, k, v, inv_temp, eps, block_n, block_k, interpret):
    n_pad, d = x.shape
    grid, x_spec, col_spec = _grid_specs(n_pad, k, d, block_n, block_k)

    m, s = pl.pallas_call(
        functools.partial(_kernel_a, block_k=block_k, d=d, v=v,
                          inv_temp=inv_temp),
        grid=grid,
        in_specs=[x_spec],
        out_specs=[col_spec, col_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((block_n, 1), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x)
    logz = m + jnp.log(s)

    ent, avgp_parts = pl.pallas_call(
        functools.partial(_kernel_b, block_k=block_k, d=d, v=v,
                          inv_temp=inv_temp, eps=eps),
        grid=grid,
        in_specs=[x_spec, col_spec, col_spec],
        out_specs=[
            col_spec,
            pl.BlockSpec((8, block_k), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((8 * (n_pad // block_n), k), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x, w, logz)
    return ent[:, 0], avgp_parts.sum(axis=0), logz


@functools.partial(
    jax.jit,
    static_argnames=('k', 'v', 'inv_temp', 'eps', 'block_n', 'block_k',
                     'interpret'),
)
def _bwd_pass(x, w, logz, entbar, gbar, *, k, v, inv_temp, eps, block_n,
              block_k, interpret):
    n_pad, d = x.shape
    grid, x_spec, col_spec = _grid_specs(n_pad, k, d, block_n, block_k)
    gbar_spec = pl.BlockSpec((1, block_k), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    gbar2d = gbar.reshape(1, k)
    entbar2d = entbar.reshape(n_pad, 1)

    sigma, gdot = pl.pallas_call(
        functools.partial(_kernel_c, block_k=block_k, d=d, v=v,
                          inv_temp=inv_temp, eps=eps),
        grid=grid,
        in_specs=[x_spec, col_spec, col_spec, col_spec, gbar_spec],
        out_specs=[col_spec, col_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((block_n, 1), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x, w, logz, entbar2d, gbar2d)

    dx = pl.pallas_call(
        functools.partial(_kernel_d, block_k=block_k, d=d, v=v,
                          inv_temp=inv_temp, eps=eps),
        grid=grid,
        in_specs=[x_spec, col_spec, col_spec, col_spec, gbar_spec,
                  col_spec],
        out_specs=[x_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((block_n, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(x, w, logz, entbar2d, gbar2d, sigma)[0]
    return dx, gdot[:, 0]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8)
)
def _stats_vjp(x, w, k, v, inv_temp, eps, block_n, block_k, interpret):
    return _entropy_fwd(x, w, k, v, inv_temp, eps, block_n, block_k,
                        interpret)[0]


def _entropy_fwd(x, w, k, v, inv_temp, eps, block_n, block_k, interpret):
    ent, avgp, logz = _fwd_pass(
        x, w.reshape(-1, 1), k=k, v=v, inv_temp=inv_temp, eps=eps,
        block_n=block_n, block_k=block_k, interpret=interpret,
    )
    return (ent, avgp), (x, w, logz)


def _entropy_bwd(k, v, inv_temp, eps, block_n, block_k, interpret, res,
                 cts):
    x, w, logz = res
    entbar, gbar = cts
    dx, dw = _bwd_pass(
        x, w.reshape(-1, 1), logz, entbar, gbar, k=k, v=v,
        inv_temp=inv_temp, eps=eps, block_n=block_n, block_k=block_k,
        interpret=interpret,
    )
    return dx, dw


_stats_vjp.defvjp(_entropy_fwd, _entropy_bwd)


def lfq_entropy_stats_fused(x, w, *, k, v, inv_temp, eps=1e-5,
                            block_n=512, block_k=2048, interpret=None):
    """(ent (N,), avg_prob_num (K,)) for the implicit ±v codebook of size
    `k = 2^d`: ent_n = entropy of token n's code softmax (UNWEIGHTED — the
    caller applies `w`), avg_prob_num_k = sum_n w_n * p_nk.

    `x` must be (N, d) f32 with N a multiple of `block_n` (pad rows with
    w=0). Differentiable in `x` and `w` via the fused backward sweeps.
    """
    n, d = x.shape
    assert n % block_n == 0, (n, block_n)
    assert k % block_k == 0, (k, block_k)
    assert k == 1 << d, (k, d)
    assert w.shape == (n,), w.shape
    if interpret is None:
        interpret = _interpret_default()
    return _stats_vjp(x, w, k, v, inv_temp, eps, block_n, block_k,
                      interpret)
