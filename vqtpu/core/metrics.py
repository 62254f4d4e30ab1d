"""First-class codebook observability metrics.

The reference exposes no metrics subsystem — its examples derive an
"active-code %" ad hoc (reference examples/autoencoder.py:111-115) and the
parity bar (BASELINE.md) is stated in terms of codebook perplexity /
utilization. Here they are jit-friendly, mask-aware functions over either
raw indices or EMA `cluster_size` state, so they run on-device inside a
compiled train step (no host round-trip) and psum cleanly under a mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def index_histogram(
    indices: jax.Array,
    codebook_size: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Counts of each code in `indices` (any shape; -1 = padding, ignored).

    Returns float32 (codebook_size,) so it can be psum'd across shards.
    """
    flat = indices.reshape(-1)
    valid = flat >= 0
    if mask is not None:
        valid = valid & mask.reshape(-1).astype(bool)
    onehot = jax.nn.one_hot(jnp.where(valid, flat, 0), codebook_size,
                            dtype=jnp.float32)
    onehot = onehot * valid[:, None].astype(jnp.float32)
    return onehot.sum(0)


def perplexity_from_histogram(counts: jax.Array, eps: float = 1e-10) -> jax.Array:
    """exp(entropy) of the code distribution: 1 = collapsed,
    codebook_size = perfectly uniform usage."""
    total = jnp.maximum(counts.sum(-1, keepdims=True), eps)
    probs = counts / total
    entropy = -jnp.sum(probs * jnp.log(jnp.maximum(probs, eps)), axis=-1)
    return jnp.exp(entropy)


def codebook_perplexity(
    indices: jax.Array,
    codebook_size: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Perplexity of the empirical code distribution in a batch of indices."""
    return perplexity_from_histogram(index_histogram(indices, codebook_size, mask))


def codebook_utilization(
    indices: jax.Array,
    codebook_size: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Fraction of codes hit at least once in the batch (the reference
    examples' "active %", examples/autoencoder.py:114, as a fraction)."""
    counts = index_histogram(indices, codebook_size, mask)
    return (counts > 0).mean()


def ema_perplexity(cluster_size: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Perplexity of the EMA cluster-size distribution — the running
    (smoothed) counterpart of `codebook_perplexity`, free to compute from
    `VectorQuantize` codebook state. Accepts (c,) or (h, c); reduces the
    last axis."""
    return perplexity_from_histogram(cluster_size, eps)


def ema_utilization(cluster_size: jax.Array, threshold: float = 1e-3) -> jax.Array:
    """Fraction of codes whose EMA cluster size exceeds `threshold` —
    the running analogue of dead-code tracking
    (reference vector_quantize_pytorch.py:564-574 expires below-threshold
    codes; this reports the live fraction without mutating anything)."""
    return (cluster_size > threshold).mean()
