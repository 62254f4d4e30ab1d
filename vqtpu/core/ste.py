"""Gradient estimators (layer L1).

Straight-through / rotation-trick / DiVeQ rewrites that keep the forward
value of the quantized output while rerouting gradients to the input. All are
expressed with `jax.lax.stop_gradient` algebra — identical math to the
reference (vector_quantize_pytorch.py:280-330,
finite_scalar_quantization.py:52-60) but functional and jit-native. These are
the custom-VJP surface of the framework; no custom_vjp is required because
the stop-gradient arithmetic already yields the right cotangents.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .utils import l2norm, safe_div

sg = jax.lax.stop_gradient


def straight_through(src: jax.Array, tgt: jax.Array) -> jax.Array:
    """Forward = tgt, backward = identity to src."""
    return src + sg(tgt - src)


def round_ste(z: jax.Array) -> jax.Array:
    """Round with straight-through gradients."""
    return z + sg(jnp.round(z) - z)


def floor_ste(z: jax.Array) -> jax.Array:
    """Floor with straight-through gradients."""
    return z + sg(jnp.floor(z) - z)


def frac_gradient(t: jax.Array, frac: float) -> jax.Array:
    """Let only `frac` of the gradient flow through `t`
    (reference residual_vq.py:42-48)."""
    if frac <= 0:
        return sg(t)
    if frac >= 1:
        return t
    return frac * t + (1.0 - frac) * sg(t)


def _efficient_rotation_trick_transform(
    u: jax.Array, q: jax.Array, e: jax.Array
) -> jax.Array:
    """Section 4.2 of https://arxiv.org/abs/2410.06424: reflect e through the
    Householder-style plane defined by u and q. u, q are unit vectors (b, d);
    e is (b, d)."""
    e = e[:, None, :]                      # (b, 1, d)
    w = sg(l2norm(u + q, axis=1))          # (b, d)
    w_col = w[:, :, None]                  # (b, d, 1)
    w_row = w[:, None, :]                  # (b, 1, d)
    u_col = sg(u)[:, :, None]
    q_row = sg(q)[:, None, :]
    out = e - 2 * (e @ w_col @ w_row) + 2 * (e @ u_col @ q_row)
    return out[:, 0, :]


def rotate_to(src: jax.Array, tgt: jax.Array) -> jax.Array:
    """Rotation-trick gradient estimator (https://arxiv.org/abs/2410.06424).

    Forward value equals tgt; the backward pass sees tgt as a (detached)
    rotation+scaling of src, so gradients rotate back onto src. Mirrors
    reference vector_quantize_pytorch.py:302-318.
    """
    lead_shape = src.shape[:-1]
    d = src.shape[-1]
    src_f = src.reshape(-1, d)
    tgt_f = tgt.reshape(-1, d)

    norm_src = jnp.linalg.norm(src_f, axis=-1, keepdims=True)
    norm_tgt = jnp.linalg.norm(tgt_f, axis=-1, keepdims=True)

    rotated_tgt = _efficient_rotation_trick_transform(
        safe_div(src_f, norm_src),
        safe_div(tgt_f, norm_tgt),
        src_f,
    )
    rotated = rotated_tgt * sg(safe_div(norm_tgt, norm_src))
    return rotated.reshape(*lead_shape, d)


def directional_reparam(
    key: jax.Array,
    src: jax.Array,
    tgt: jax.Array,
    noise_variance: float = 5e-3,
) -> jax.Array:
    """DiVeQ directional reparameterization
    (figure 1, https://openreview.net/forum?id=KRVnpTbx7R; reference
    vector_quantize_pytorch.py:320-330). Adds the error direction (noised,
    unit-normalized, detached) scaled by the differentiable error norm."""
    error_dir = tgt - src
    error_dir_norm = jnp.linalg.norm(error_dir, axis=-1, keepdims=True)
    noise = jax.random.normal(key, error_dir.shape, dtype=error_dir.dtype)
    noised_dir = error_dir + math.sqrt(noise_variance) * noise
    unit_noised_dir = sg(l2norm(noised_dir))
    return src + unit_noised_dir * error_dir_norm
