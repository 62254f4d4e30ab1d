"""Core tensor/math utilities (layer L0 of the framework).

TPU-native re-design of the helper toolkit the reference library keeps at the
top of each module (see reference vector_quantize_pytorch.py:19-236). Pure
functions over jnp arrays; no state, no torch semantics. Everything here is
jit-traceable with static shapes.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp


def exists(val: Any) -> bool:
    return val is not None


def default(val, d):
    return val if val is not None else d


def first(it):
    return it[0]


def identity(t):
    return t


def at_most_one_of(*bools: bool) -> bool:
    return sum(map(int, bools)) <= 1


def cast_tuple(t, length: int = 1):
    return t if isinstance(t, tuple) else ((t,) * length)


def round_up_multiple(num: int, mult: int) -> int:
    return math.ceil(num / mult) * mult


def l2norm(t: jax.Array, axis: int = -1, eps: float = 1e-6) -> jax.Array:
    """L2-normalize along `axis`; norm is clamped from below at `eps`
    (matches the semantics of torch F.normalize used at reference
    vector_quantize_pytorch.py:37-38)."""
    norm = jnp.linalg.norm(t, ord=2, axis=axis, keepdims=True)
    return t / jnp.maximum(norm, eps)


def safe_div(num: jax.Array, den: jax.Array, eps: float = 1e-6) -> jax.Array:
    return num / jnp.maximum(den, eps)


def log(t: jax.Array, eps: float = 1e-20) -> jax.Array:
    return jnp.log(jnp.maximum(t, eps))


def entropy(prob: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Shannon entropy along the last axis."""
    return (-prob * log(prob, eps=eps)).sum(axis=-1)


def append_dims_to(t: jax.Array, ndims: int) -> jax.Array:
    assert t.ndim <= ndims
    return t.reshape(*t.shape, *((1,) * (ndims - t.ndim)))


def cdist_sq(x: jax.Array, y: jax.Array, precision=None) -> jax.Array:
    """Squared euclidean pairwise distances: (..., i, d) x (..., j, d) ->
    (..., i, j) via the expansion ||x||^2 - 2 x y^T + ||y||^2.

    This is the XLA-reference formulation of the hot distance computation
    (reference vector_quantize_pytorch.py:58-62); the fused Pallas kernel in
    vqtpu.kernels.distance implements the same math tiled for the MXU.
    Accumulates in float32 regardless of input dtype. `precision=HIGHEST`
    makes the cross-term matmul f32-faithful on TPU (default is one bf16
    pass) — the determinism knob behind beam_score_precision.
    """
    x2 = (x.astype(jnp.float32) ** 2).sum(axis=-1)
    y2 = (y.astype(jnp.float32) ** 2).sum(axis=-1)
    xy = jnp.einsum(
        '...id,...jd->...ij', x, y, preferred_element_type=jnp.float32,
        precision=precision,
    )
    return x2[..., :, None] - 2.0 * xy + y2[..., None, :]


def cdist(x: jax.Array, y: jax.Array, eps: float = 1e-8, precision=None) -> jax.Array:
    """Euclidean pairwise distance with a numerical floor, matching the
    reference cdist (clamp then sqrt)."""
    return jnp.sqrt(jnp.maximum(cdist_sq(x, y, precision=precision), eps))


def lens_to_mask(lens: jax.Array, max_length: int) -> jax.Array:
    """(b,) lengths -> (b, max_length) boolean mask."""
    seq = jnp.arange(max_length)
    return seq[None, :] < lens[:, None]


def masked_mean(
    t: jax.Array,
    mask: jax.Array | None,
    eps: float = 1e-6,
) -> jax.Array:
    """Mean of `t` over elements where `mask` is True.

    `mask` broadcasts against `t` from the leading dims; trailing dims of `t`
    not covered by the mask are averaged unconditionally. This reproduces
    torch's `t[mask].mean()` (reference vector_quantize_pytorch.py:1325)
    without boolean indexing (which would be shape-dynamic under jit).
    """
    if mask is None:
        return t.mean()
    weights = jnp.broadcast_to(append_dims_to(mask, t.ndim).astype(t.dtype), t.shape)
    return (t * weights).sum() / jnp.maximum(weights.sum(), eps)


def uniform_init(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Kaiming-uniform initialization over the trailing fan-in dims, used for
    fresh codebooks (reference vector_quantize_pytorch.py:112-115)."""
    fan_in = math.prod(shape[1:]) if len(shape) > 1 else shape[0]
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def laplace_smoothing(
    x: jax.Array, n_categories: int, eps: float = 1e-5, axis: int = -1
) -> jax.Array:
    denom = x.sum(axis=axis, keepdims=True)
    return (x + eps) / (denom + n_categories * eps)


def orthogonal_loss_fn(t: jax.Array) -> jax.Array:
    """Eq (2) from https://arxiv.org/abs/2112.00384 over (h, n, d) codebooks
    (reference vector_quantize_pytorch.py:340-345)."""
    h, n = t.shape[:2]
    normed = l2norm(t)
    cosine_sim = jnp.einsum(
        'hid,hjd->hij', normed, normed, preferred_element_type=jnp.float32
    )
    return (cosine_sim ** 2).sum() / (h * n ** 2) - (1.0 / n)


def pack_tokens(x: jax.Array) -> tuple[jax.Array, Callable[[jax.Array], jax.Array]]:
    """Flatten (h, ..., d) -> (h, N, d); returns the flat array and an
    `unpack(t)` that restores the middle dims on any array whose leading dim
    is h and trailing dims may differ from d. Static-shape analogue of the
    reference's einops pack_one('h * d')."""
    lead, middle, dim = x.shape[0], x.shape[1:-1], x.shape[-1]
    n = math.prod(middle) if middle else 1
    flat = x.reshape(lead, n, dim)

    def unpack(t: jax.Array) -> jax.Array:
        return t.reshape(t.shape[0], *middle, *t.shape[2:])

    return flat, unpack


def batched_bincount(x: jax.Array, *, minlength: int) -> jax.Array:
    """(h, n) int indices -> (h, minlength) counts. One-hot matmul so it maps
    to the MXU rather than a scatter (reference uses scatter_add_,
    vector_quantize_pytorch.py:231-236)."""
    one_hot = jax.nn.one_hot(x, minlength, dtype=jnp.float32)
    return one_hot.sum(axis=-2)
