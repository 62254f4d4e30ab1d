"""Tensor-parallel (row-sharded) codebooks: the north-star extension beyond
the reference's replicate-everything design (SURVEY.md §2, TP row; the
reference keeps the full codebook on every rank and only syncs statistics,
vector_quantize_pytorch.py:603-607).

For codebooks too large to replicate (e.g. 1M+ rows), the rows shard over a
`code` mesh axis. Everything here is written for the INTERIOR of a
`shard_map` over a mesh with a `code` axis and (optionally) a `data` axis:

  - `sharded_quantize` — nearest-code selection against the local rows
    (fused kernel), global argmin reduction over `code`, and the quantized
    lookup realized shard-locally + psum (each token's row lives on exactly
    one shard, so the psum is a masked broadcast, not a sum of parts).
  - `ShardedCodebookState` / `sharded_ema_update` — EMA codebook statistics
    where `cluster_size`/`embed_avg`/`embed` are sharded with the rows:
    one-hot stats accumulate locally over the shard's own rows, psum over
    `data` (token shards), and laplace smoothing uses the global cluster
    mass (psum over `code`). Bit-parity with the unsharded Codebook engine
    is asserted in tests/test_parallel.py on a 2D (data, code) CPU mesh.

Selection overlap note: the all_gather of (score, index) pairs in
`sharded_nearest_code` is O(n) per shard and rides ICI; XLA overlaps it
with the next chunk's distance matmul when the caller pipelines chunks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .shard import sharded_nearest_code


class ShardedCodebookState(NamedTuple):
    """Row-sharded EMA codebook state (leaves are the LOCAL shard)."""
    embed: jax.Array          # (c_local, d)
    embed_avg: jax.Array      # (c_local, d)
    cluster_size: jax.Array   # (c_local,)


def init_sharded_codebook(embed_shard: jax.Array) -> ShardedCodebookState:
    return ShardedCodebookState(
        embed=embed_shard,
        embed_avg=embed_shard.astype(jnp.float32),
        cluster_size=jnp.ones(embed_shard.shape[0], jnp.float32),
    )


def _local_onehot(global_idx: jax.Array, c_local: int, code_axis: str):
    """One-hot of each token over THIS shard's rows (zero rows for tokens
    owned by other shards)."""
    rank = jax.lax.axis_index(code_axis)
    local = global_idx - rank * c_local
    mine = (local >= 0) & (local < c_local)
    onehot = jax.nn.one_hot(
        jnp.where(mine, local, 0), c_local, dtype=jnp.float32
    )
    return onehot * mine[:, None].astype(jnp.float32), local, mine


def sharded_quantize(
    x: jax.Array,
    embed_shard: jax.Array,
    code_axis: str,
    metric: str = 'euclidean',
) -> tuple[jax.Array, jax.Array]:
    """(n, d) tokens vs (c_local, d) local rows -> (global indices, quantized).

    The quantized row for each token lives on exactly one shard: each shard
    contributes its owned rows (one-hot matmul — exact and MXU-friendly,
    see kernels.distance.gather_codes) and a psum over `code` broadcasts
    them to all shards.
    """
    idx = sharded_nearest_code(x, embed_shard, code_axis, metric)
    c_local = embed_shard.shape[0]
    onehot, _, _ = _local_onehot(idx, c_local, code_axis)
    q = jnp.einsum(
        'nc,cd->nd', onehot, embed_shard.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    from . import collectives

    q = collectives.psum_exact(q, code_axis)   # identity-transpose psum
    return idx, q.astype(embed_shard.dtype)


def sharded_ema_update(
    state: ShardedCodebookState,
    x: jax.Array,
    global_idx: jax.Array,
    *,
    code_axis: str,
    data_axis: str | None = None,
    decay: float = 0.99,
    eps: float = 1e-5,
) -> ShardedCodebookState:
    """One EMA codebook update on row-sharded state (the TP analogue of
    Codebook.update_codebook: track -> ema -> laplace-normalize, reference
    vector_quantize_pytorch.py:576-641).

    x: (n_local, d) this data-shard's tokens; global_idx: (n_local,) their
    selected global code indices. Stats psum over `data_axis` (None = no
    data parallelism); the laplace denominator psums the cluster mass over
    `code_axis` so normalization matches the unsharded engine exactly.
    """
    c_local = state.embed.shape[0]
    onehot, _, _ = _local_onehot(global_idx, c_local, code_axis)

    bins = onehot.sum(axis=0)                                   # (c_local,)
    embed_sum = jnp.einsum(
        'nc,nd->cd', onehot, x.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if data_axis is not None:
        bins = jax.lax.psum(bins, data_axis)
        embed_sum = jax.lax.psum(embed_sum, data_axis)

    # lerp form matches the unsharded engine bit-for-bit
    # (codebook.Codebook._ema_inplace: old + (new - old) * (1 - decay))
    cluster_size = state.cluster_size + (bins - state.cluster_size) * (1.0 - decay)
    embed_avg = state.embed_avg + (embed_sum - state.embed_avg) * (1.0 - decay)

    # laplace smoothing over the GLOBAL codebook (reference :152-154: the
    # denominator is the total cluster mass across all codes)
    c_global = c_local * jax.lax.psum(1, code_axis)
    total = jax.lax.psum(cluster_size.sum(), code_axis)
    smoothed = (cluster_size + eps) / (total + c_global * eps) * total
    embed = embed_avg / smoothed[:, None]

    return ShardedCodebookState(
        embed=embed.astype(state.embed.dtype),
        embed_avg=embed_avg,
        cluster_size=cluster_size,
    )
