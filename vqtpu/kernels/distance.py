"""Fused nearest-code selection: Pallas TPU kernel + XLA reference impl.

The hot loop of every euclidean/cosine codebook lookup is
    dist[n, c] = ||x_n||^2 - 2 x_n.c_c + ||c_c||^2 ;  ind[n] = argmin_c dist
(reference vector_quantize_pytorch.py:58-62,729-747). Materializing the full
(n, c) distance matrix in HBM costs n*c*4 bytes of write+read bandwidth that
the argmin immediately throws away. The Pallas kernel below streams codebook
tiles through VMEM, computes scores on the MXU and keeps only a running
(best, argbest) per token, so HBM traffic is ~ n*d + c*d + n*4 bytes —
the roofline the bench harness measures against.

Both metrics reduce to one primitive:  argmax_c (x . c_c + bias_c)
  - cosine:     bias = 0                       (inputs pre-l2-normalized)
  - euclidean:  bias_c = -||c_c||^2 / 2        (||x||^2 is constant in c)

The kernel is an optimization layer, never a semantics layer: `nearest_code`
falls back to the XLA implementation off-TPU (or under `force_xla`), and the
test-suite asserts exact index agreement between the two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.utils import cdist_sq

NEG_INF = float('-inf')


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def nearest_code_xla(x: jax.Array, embed: jax.Array, metric: str = 'euclidean') -> jax.Array:
    """(n, d), (c, d) -> (n,) int32 indices of the nearest code."""
    if metric == 'cosine':
        scores = jnp.einsum('nd,cd->nc', x, embed, preferred_element_type=jnp.float32)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return jnp.argmin(cdist_sq(x, embed), axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _argmax_score_kernel(x_ref, c_ref, bias_ref, idx_ref, best_ref, bestidx_ref, *, block_c: int):
    j = pl.program_id(1)

    scores = jax.lax.dot_general(
        x_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]                                     # (BN, BC)

    local_best = jnp.max(scores, axis=1, keepdims=True)          # (BN, 1)
    local_arg = jnp.argmax(scores, axis=1, keepdims=True).astype(jnp.int32)
    local_arg = local_arg + j * block_c

    @pl.when(j == 0)
    def _():
        best_ref[:] = local_best
        bestidx_ref[:] = local_arg

    @pl.when(j > 0)
    def _():
        improved = local_best > best_ref[:]
        best_ref[:] = jnp.where(improved, local_best, best_ref[:])
        bestidx_ref[:] = jnp.where(improved, local_arg, bestidx_ref[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        idx_ref[:] = bestidx_ref[:]


@functools.partial(jax.jit, static_argnames=('block_n', 'block_c', 'interpret'))
def _nearest_code_pallas(
    x: jax.Array,
    embed: jax.Array,
    bias: jax.Array,
    *,
    block_n: int,
    block_c: int,
    interpret: bool,
) -> jax.Array:
    n, d = x.shape
    c = embed.shape[0]
    grid = (n // block_n, c // block_c)

    kernel = functools.partial(_argmax_score_kernel, block_c=block_c)

    idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((block_n, 1), jnp.float32),
            pltpu.VMEM((block_n, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * d,
            bytes_accessed=n * d * 4 + c * d * 4 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, embed, bias)
    return idx[:, 0]


def _prepare_operands(x, embed, metric, block_n, block_c):
    """Pad operands so every dim tiles cleanly; padded codes get -inf bias so
    they never win the argmax; padded tokens are sliced away by the caller."""
    n, d = x.shape
    c = embed.shape[0]

    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)

    if metric == 'cosine':
        bias = jnp.zeros((c,), jnp.float32)
    else:
        bias = -0.5 * (embed ** 2).sum(axis=-1)

    d_pad = _round_up(d, 128) - d
    n_pad = _round_up(n, block_n) - n
    c_pad = _round_up(c, block_c) - c

    if d_pad:
        x = jnp.pad(x, ((0, 0), (0, d_pad)))
        embed = jnp.pad(embed, ((0, 0), (0, d_pad)))
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    if c_pad:
        embed = jnp.pad(embed, ((0, c_pad), (0, 0)))
        bias = jnp.pad(bias, (0, c_pad), constant_values=-3.0e38)

    return x, embed, bias.reshape(1, -1), n


def nearest_code(
    x: jax.Array,
    embed: jax.Array,
    metric: str = 'euclidean',
    *,
    block_n: int = 512,
    block_c: int = 1024,
    force_xla: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Nearest-code indices for (..., n, d) tokens against (..., c, d) codes.

    Leading (head) dims are mapped with vmap. Uses the fused Pallas kernel on
    TPU, the XLA formulation elsewhere. Tie-breaking matches jnp.argmin
    (first index wins) on both paths.
    """
    assert metric in ('euclidean', 'cosine')

    if x.ndim > 2:
        fn = functools.partial(
            nearest_code, metric=metric, block_n=block_n, block_c=block_c,
            force_xla=force_xla, interpret=interpret,
        )
        return jax.vmap(fn)(x, embed)

    backend = jax.default_backend()
    if force_xla or (backend != 'tpu' and interpret is not True):
        return nearest_code_xla(x, embed, metric)

    n, d = x.shape
    c = embed.shape[0]
    block_n = min(block_n, _round_up(n, 8))
    block_c = min(block_c, _round_up(c, 128))

    # guard against VMEM blowup on very wide features; fall back to XLA
    if d > 4096:
        return nearest_code_xla(x, embed, metric)

    xp, ep, bias, orig_n = _prepare_operands(x, embed, metric, block_n, block_c)
    idx = _nearest_code_pallas(
        xp, ep, bias,
        block_n=block_n, block_c=block_c,
        interpret=bool(interpret) if interpret is not None else False,
    )
    return idx[:orig_n]
