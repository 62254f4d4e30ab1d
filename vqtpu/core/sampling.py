"""Sampling utilities with explicit PRNG keys (layer L0/L1).

TPU-native rework of the reference's gumbel/topk sampling and vector
sampling helpers (vector_quantize_pytorch.py:117-166). All functions take an
explicit `jax.random` key; under data parallelism every replica derives the
same key from the shared rng stream, which replaces the reference's
seed-all-reduce machinery (residual_vq.py:96-102) outright.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils import log


def gumbel_noise(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    noise = jax.random.uniform(key, shape, dtype=dtype, minval=0.0, maxval=1.0)
    return -log(-log(noise))


def gumbel_sample(
    key: jax.Array | None,
    logits: jax.Array,
    temperature: float = 1.0,
    stochastic: bool = False,
    straight_through: bool = False,
    training: bool = True,
    topk: int | None = None,
    approx_topk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Select codes from a (..., c) logit tensor.

    Returns (indices, one_hot). Modes (mirroring reference
    vector_quantize_pytorch.py:121-150):
      - deterministic argmax (default / eval)
      - gumbel-perturbed stochastic sampling (`stochastic=True`, temp > 0)
      - top-k (beam) selection (`topk=k`): indices (..., k), one_hot (..., k, c)
      - straight-through softmax relaxation (`straight_through=True`)

    `approx_topk=True` swaps the exact `lax.top_k` (a full sort per row on
    TPU — the dominant cost of beam search over wide codebooks) for
    `lax.approx_max_k` (TPU-native partial reduction, recall_target=0.95) —
    candidate sets may differ from the exact beam near score ties.
    """
    dtype, size = logits.dtype, logits.shape[-1]

    if training and stochastic and temperature > 0:
        assert key is not None, 'stochastic sampling requires a PRNG key'
        sampling_logits = (logits / temperature) + gumbel_noise(
            key, logits.shape, dtype=logits.dtype
        )
    else:
        sampling_logits = logits

    if topk is not None:
        if approx_topk:
            _, ind = jax.lax.approx_max_k(
                sampling_logits, topk, recall_target=0.95
            )
            ind = ind.astype(jnp.int32)
        else:
            _, ind = jax.lax.top_k(sampling_logits, topk)
    else:
        ind = jnp.argmax(sampling_logits, axis=-1)

    one_hot = jax.nn.one_hot(ind, size, dtype=dtype)

    if not straight_through or temperature <= 0.0 or not training:
        return ind, one_hot

    pi1 = jax.nn.softmax(logits / temperature, axis=-1)
    if topk is not None:
        pi1 = pi1[..., None, :]
    one_hot = one_hot + pi1 - jax.lax.stop_gradient(pi1)
    return ind, one_hot


def sample_vectors(key: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """Sample `num` rows from (n, d): without replacement when n >= num,
    with replacement otherwise (reference vector_quantize_pytorch.py:156-163).
    Shapes are static so this is jit-safe."""
    n = samples.shape[0]
    if n >= num:
        indices = jax.random.permutation(key, n)[:num]
    else:
        indices = jax.random.randint(key, (num,), 0, n)
    return jnp.take(samples, indices, axis=0)


def batched_sample_vectors(key: jax.Array, samples: jax.Array, num: int) -> jax.Array:
    """(h, n, d) -> (h, num, d), an independent draw per codebook head."""
    keys = jax.random.split(key, samples.shape[0])
    return jax.vmap(lambda k, s: sample_vectors(k, s, num))(keys, samples)


def masked_sample_vectors(
    key: jax.Array, samples: jax.Array, mask: jax.Array | None, num: int
) -> jax.Array:
    """Sample `num` rows of (n, d) `samples` restricted to rows where `mask`
    is True, with replacement, in a shape-static way.

    This is the jit-safe replacement for the reference's boolean-indexed
    replacement sampling (vector_quantize_pytorch.py:544-562): instead of
    materializing the variable-length masked subset, draw categorical samples
    with -inf logits on masked-out rows. If the mask is all-False the draw
    falls back to uniform over all rows (the reference skips replacement in
    that case; callers guard with a `where`).
    """
    return jnp.take(
        samples, masked_sample_indices(key, samples.shape[0], mask, num), axis=0
    )


def masked_sample_indices(
    key: jax.Array, n: int, mask: jax.Array | None, num: int
) -> jax.Array:
    """The index draw underlying `masked_sample_vectors`, exposed separately
    so row-sharded codebooks can draw the GLOBAL index vector with the shared
    key and `take` only their local slice (bit-identical to scattering the
    unsharded draw, without materializing (c, d) candidates per shard)."""
    if mask is None:
        return jax.random.randint(key, (num,), 0, n)
    mask = mask.astype(bool)
    any_valid = mask.any()
    logits = jnp.where(mask, 0.0, -jnp.inf)
    logits = jnp.where(any_valid, logits, jnp.zeros_like(logits))
    return jax.random.categorical(key, logits, shape=(num,))
