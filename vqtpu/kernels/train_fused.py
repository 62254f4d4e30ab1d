"""Fused VQ training-step kernel: selection + exact lookup + EMA statistics
in one pass over the tokens.

The XLA composition of the training forward (reference hot path
vector_quantize_pytorch.py:586-617 — select, lookup, cluster_size,
embed_sum) re-materializes the (n, c) one-hot in HBM between the lookup and
the statistics matmuls and re-reads x; measured 8.0 MXU-pass-equivalents vs
the 7-pass floor at the BASELINE shape (benchmarks/train_step_tpu.py,
round 2). This kernel keeps each token block's scores, one-hot, lookup and
stat contributions in VMEM:

  per (block_n, d) token block, codebook resident in VMEM:
    scores    = x @ e^T + bias            (1 MXU pass,  f32 accum)
    idx       = first-index argmax        (VPU epilogue)
    onehot    = iota == idx               (VPU, VMEM only — never in HBM)
    quantize  = onehot @ e   @ HIGHEST    (3 passes, bit-exact rows)
    embed_sum += onehotᵀ(w) @ x @ HIGHEST (3 passes, f32-faithful sums)
    bins      += (onehot * w).sum(0)

`w` is an optional per-token weight column (mask weighting; padded tokens
get w=0 so they contribute nothing to the statistics while their lookup
rows are discarded by the caller's slice).

Exactness contract (asserted on-chip by tools/verify_drive.py):
- idx matches `nearest_code` tie-breaking (first index).
- quantize rows are BIT-EQUAL to the codebook rows at idx (the one-hot
  operand is exact in every pass of the HIGHEST decomposition).
- bins/embed_sum equal the XLA one-hot einsum at HIGHEST up to f32
  accumulation order (the kernel accumulates block-partial sums; the
  einsum accumulates along the MXU contraction — same values, different
  grouping; cross-replica determinism is unaffected since every replica
  runs the same kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import _round_up, _select_epilogue


def _fused_train_kernel(
    x_ref, e_ref, bias_ref, w_ref,
    idx_ref, q_ref, bins_ref, esum_ref,
    bins_acc, esum_acc,
    *, c_padded: int,
):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    x = x_ref[:]                                              # (bn, d)
    e = e_ref[:]                                              # (c, d)

    scores = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]                                           # (bn, c)

    idx = _select_epilogue(scores, c_padded)                  # (bn, 1)
    idx_ref[:] = idx.reshape(idx_ref.shape)

    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    onehot = (iota == idx).astype(jnp.float32)                # (bn, c)

    # bit-exact lookup: the one-hot operand is exact in every pass of the
    # HIGHEST (bf16x3) decomposition, so the result rows ARE codebook rows
    q_ref[:] = jax.lax.dot_general(
        onehot, e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    weighted = onehot * w_ref[:]                              # (bn, c)

    @pl.when(i == 0)
    def _():
        bins_acc[:] = jnp.zeros_like(bins_acc[:])
        esum_acc[:] = jnp.zeros_like(esum_acc[:])

    bins_acc[:] = bins_acc[:] + weighted.sum(axis=0, keepdims=True)
    esum_acc[:] = esum_acc[:] + jax.lax.dot_general(
        weighted, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                         # (c, d)

    @pl.when(i == n_i - 1)
    def _():
        bins_ref[:] = bins_acc[:]
        esum_ref[:] = esum_acc[:]


@functools.partial(jax.jit, static_argnames=('block_n', 'interpret'))
def _fused_train_pallas(x, embed, bias, w, *, block_n: int, interpret: bool):
    n, d = x.shape
    c = embed.shape[0]
    rows, lane = (block_n // 128, 128) if block_n % 128 == 0 else (1, block_n)

    grid = (n // block_n,)
    idx, q, bins, esum = pl.pallas_call(
        functools.partial(_fused_train_kernel, c_padded=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, lane), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n // block_n * rows, lane), jnp.int32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((c, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((c, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        cost_estimate=pl.CostEstimate(
            flops=7 * 2 * n * c * d,
            bytes_accessed=n * d * 4 * 2 + c * d * 4 * 2 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, embed, bias, w)
    return idx.reshape(-1), q, bins.reshape(-1), esum


def fused_train_quantize(
    x: jax.Array,
    embed: jax.Array,
    metric: str = 'euclidean',
    weights: jax.Array | None = None,
    *,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(n, d) tokens, (c, d) codebook -> (idx, quantize, bins, embed_sum).

    `weights`: optional (n,) f32 statistic weights (mask); lookup rows are
    always computed, statistics are weighted. Cosine metric expects
    pre-normalized operands (as in nearest_code).
    """
    assert metric in ('euclidean', 'cosine')
    n, d = x.shape
    c = embed.shape[0]

    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    weights = weights.astype(jnp.float32)

    if metric == 'cosine':
        bias = jnp.zeros((c,), jnp.float32)
    else:
        bias = -0.5 * (embed ** 2).sum(axis=-1)

    d_pad = _round_up(d, 128) - d
    c_pad = _round_up(c, 128) - c
    # one uniform block size: pad n up to a block multiple (padded tokens
    # carry zero weight, so they cannot touch the statistics); tiny inputs
    # get a single sub-128 tile
    bn = block_n if n >= 128 else max(_round_up(n, 8), 8)
    n_pad = _round_up(n, bn) - n

    if d_pad:
        x = jnp.pad(x, ((0, 0), (0, d_pad)))
        embed = jnp.pad(embed, ((0, 0), (0, d_pad)))
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        weights = jnp.pad(weights, (0, n_pad))     # zero weight: no stats
    if c_pad:
        embed = jnp.pad(embed, ((0, c_pad), (0, 0)))
        bias = jnp.pad(bias, (0, c_pad), constant_values=-3.0e38)

    idx, q, bins, esum = _fused_train_pallas(
        x, embed, bias.reshape(1, -1), weights.reshape(-1, 1),
        block_n=bn, interpret=interpret,
    )
    return idx[:n], q[:n, :d], bins[:c], esum[:c, :d]
