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
rows are discarded by the caller's slice). The UNWEIGHTED variant (the
common case) compiles a kernel with no weight input at all — `weighted`
IS the one-hot, which drops one (block_n, c) VMEM buffer and the
lane-padded (block_n, 1) input stream.

Silicon lessons (round 4, v5e — the r3 kernel had only ever run in
interpret mode):
- Mosaic requires output block sublanes divisible by 8: the r3 idx packing
  (block_n//128, 128) is ILLEGAL at block_n=512 (sublane 4). Packed as
  (block_n//64, 64) instead — dense, and legal for every block_n multiple
  of 512.
- Scoped VMEM is a hard 16MB: at block_n=1024 the r3 kernel allocated
  18.06M (weighted buffer + lane-padded w blocks + (n,c) intermediates).
  Default block_n is 512 and the weight input only exists when a mask is
  actually passed.

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
    x_ref, e_ref, bias_ref, *rest,
    c_padded: int, has_weights: bool,
):
    if has_weights:
        (w_ref, idx_ref, q_ref, bins_ref, esum_ref,
         bins_acc, esum_acc) = rest
    else:
        (idx_ref, q_ref, bins_ref, esum_ref,
         bins_acc, esum_acc) = rest
        w_ref = None

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

    # the common (unmasked) case skips the extra (bn, c) buffer entirely
    weighted = onehot if w_ref is None else onehot * w_ref[:]

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


@functools.partial(
    jax.jit, static_argnames=('block_n', 'interpret', 'has_weights')
)
def _fused_train_pallas(
    x, embed, bias, w, *, block_n: int, interpret: bool, has_weights: bool
):
    n, d = x.shape
    c = embed.shape[0]
    # idx packing: dense (block_n//64, 64) i32 tiles — sublane multiple of
    # 8 for every block_n that is a multiple of 512 (Mosaic rejects the
    # (block_n//128, 128) layout at block_n=512: sublane 4)
    rows, lane = (block_n // 64, 64) if block_n % 512 == 0 else (1, block_n)

    grid = (n // block_n,)
    in_specs = [
        pl.BlockSpec((block_n, d), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, embed, bias]
    if has_weights:
        in_specs.append(
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM))
        operands.append(w)

    idx, q, bins, esum = pl.pallas_call(
        functools.partial(_fused_train_kernel, c_padded=c,
                          has_weights=has_weights),
        grid=grid,
        in_specs=in_specs,
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
    )(*operands)
    return idx.reshape(-1), q, bins.reshape(-1), esum


def fused_train_quantize(
    x: jax.Array,
    embed: jax.Array,
    metric: str = 'euclidean',
    weights: jax.Array | None = None,
    *,
    block_n: int = 512,
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
    has_weights = weights is not None

    if metric == 'cosine':
        bias = jnp.zeros((c,), jnp.float32)
    else:
        bias = -0.5 * (embed ** 2).sum(axis=-1)

    d_pad = _round_up(d, 128) - d
    c_pad = _round_up(c, 128) - c
    # one uniform block size: pad n up to a block multiple (padded tokens
    # land on codebook row 0 with bias-padded scores; the unweighted
    # variant must therefore only ever see block-aligned n — enforced by
    # switching any padded call to the weighted variant with a 0/1 mask)
    bn = block_n if n >= 128 else max(_round_up(n, 8), 8)
    n_pad = _round_up(n, bn) - n
    if n_pad and not has_weights:
        # padded tokens must not touch the statistics: weight them 0
        has_weights = True
        weights = jnp.ones((n,), jnp.float32)
    if has_weights:
        weights = weights.astype(jnp.float32)

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
        x, embed, bias.reshape(1, -1),
        None if not has_weights else weights.reshape(-1, 1),
        block_n=bn, interpret=interpret, has_weights=has_weights,
    )
    return idx[:n], q[:n, :d], bins[:c], esum[:c, :d]
