"""K-means codebook initialization (component C2).

Lloyd's algorithm over the first training batch, jit-native: a fixed number
of iterations, one-hot-matmul scatter (MXU) instead of scatter_add, masked
token support, and cross-replica reduction via `psum` over an optional mesh
axis (replacing the reference's pluggable `all_reduce_fn`,
vector_quantize_pytorch.py:238-278).

Distributed candidate pooling: the reference gathers variably-sized sample
sets with a rank-0 multinomial split (vector_quantize_pytorch.py:193-229).
Here every shard contributes a fixed-size candidate buffer via `all_gather`
and all replicas draw the initial means from the pooled buffer with the same
PRNG key — deterministic and shape-static.

Tensor-parallel (`code_axis`): when the centroids are row-sharded over a
mesh axis, each shard draws/updates only its own centroid rows.  The initial
draw uses the shared key for the GLOBAL index vector and slices this shard's
window — bit-identical to scattering the unsharded draw — and the assignment
step is the cross-shard (score, index) argmax reduction
(parallel.shard.sharded_nearest_code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.utils import cdist_sq, l2norm
from ..core.sampling import masked_sample_vectors, masked_sample_indices
from ..parallel import collectives
from ..parallel.shard import local_onehot_from_global, sharded_nearest_code


def sample_means(
    key: jax.Array,
    samples: jax.Array,
    mask: jax.Array | None,
    num_clusters: int,
    sync_axis: str | None = None,
    code_axis: str | None = None,
) -> jax.Array:
    """Draw initial means: (h, n, d) -> (h, num_clusters, d) — or
    (h, c_local, d) when `code_axis` shards the centroid rows.  When
    `sync_axis` is set, candidates are pooled from every data replica."""
    h = samples.shape[0]

    if code_axis is not None:
        world = jax.lax.axis_size(code_axis)
        c_local = num_clusters // world
        row0 = jax.lax.axis_index(code_axis) * c_local

    def per_head(k, s, m):
        if code_axis is not None:
            # global index draw with the shared key, local slice only (never
            # materializes (c, d) per shard)
            idx = masked_sample_indices(k, s.shape[0], m, num_clusters)
            my_idx = jax.lax.dynamic_slice_in_dim(idx, row0, c_local)
            cand = jnp.take(s, my_idx, axis=0)
            if sync_axis is not None:
                # per-slot uniform source replica (rank-select psum): same
                # distribution as the unsharded pooled draw below
                dworld = jax.lax.axis_size(sync_axis)
                my_rank = jax.lax.axis_index(sync_axis)
                src = jax.random.randint(
                    jax.random.fold_in(k, 1), (num_clusters,), 0, dworld
                )
                my_src = jax.lax.dynamic_slice_in_dim(src, row0, c_local)
                cand = collectives.psum(
                    jnp.where((my_src == my_rank)[:, None], cand, 0.0),
                    sync_axis,
                )
            return cand
        local = masked_sample_vectors(k, s, m, num_clusters)
        pooled = collectives.all_gather(local, sync_axis)       # (world*c, d)
        if sync_axis is not None:
            idx = jax.random.randint(k, (num_clusters,), 0, pooled.shape[0])
            return jnp.take(pooled, idx, axis=0)
        return pooled

    keys = jax.random.split(key, h)
    if mask is not None:
        return jax.vmap(per_head)(keys, samples, mask)
    return jax.vmap(lambda k, s: per_head(k, s, None))(keys, samples)


def kmeans(
    key: jax.Array,
    samples: jax.Array,
    num_clusters: int,
    num_iters: int = 10,
    use_cosine_sim: bool = False,
    mask: jax.Array | None = None,
    sync_axis: str | None = None,
    code_axis: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(h, n, d) samples -> (means (h, c, d), bins (h, c)); with `code_axis`
    the returned means/bins are this shard's LOCAL centroid rows.

    Masked tokens (mask False) are excluded from assignments and counts.
    """
    h, n, d = samples.shape
    samples = samples.astype(jnp.float32)

    means = sample_means(key, samples, mask, num_clusters, sync_axis, code_axis)
    c_rows = means.shape[1]                   # num_clusters, or c_local (TP)
    metric = 'cosine' if use_cosine_sim else 'euclidean'

    if code_axis is not None:
        row0 = jax.lax.axis_index(code_axis) * c_rows

    weights = None
    if mask is not None:
        weights = mask.astype(jnp.float32)                       # (h, n)

    def body(means, _):
        if code_axis is not None:
            buckets = jax.vmap(
                lambda xs, ms: sharded_nearest_code(xs, ms, code_axis, metric)
            )(samples, means)                                     # (h, n) global
            one_hot = local_onehot_from_global(buckets, c_rows, row0)
        else:
            if use_cosine_sim:
                dists = jnp.einsum(
                    'hnd,hcd->hnc', samples, means,
                    preferred_element_type=jnp.float32,
                )
            else:
                dists = -cdist_sq(samples, means)
            buckets = jnp.argmax(dists, axis=-1)                  # (h, n)
            one_hot = jax.nn.one_hot(buckets, c_rows, dtype=jnp.float32)

        if weights is not None:
            one_hot = one_hot * weights[..., None]

        bins = one_hot.sum(axis=1)                                # (h, c_rows)
        bins = collectives.psum(bins, sync_axis)

        # HIGHEST: exact one-hot-masked sums into the init state (on TPU the
        # default would round samples to bf16)
        new_means = jnp.einsum(
            'hnc,hnd->hcd', one_hot, samples,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        new_means = collectives.psum(new_means, sync_axis)

        zero_mask = bins == 0
        bins_clamped = jnp.where(zero_mask, 1.0, bins)
        new_means = new_means / bins_clamped[..., None]

        if use_cosine_sim:
            new_means = l2norm(new_means)

        means = jnp.where(zero_mask[..., None], means, new_means)
        return means, bins

    bins = jnp.zeros((h, c_rows), jnp.float32)
    for _ in range(num_iters):
        means, bins = body(means, None)

    return means, bins
