"""LatentQuantize — Disentanglement via Latent Quantization (component C14).

https://arxiv.org/abs/2305.18378. TPU-native re-design of the reference
LatentQuantize (latent_quantization.py:28-310): each latent dimension
quantizes to the nearest of a small set of per-dimension scalar values,
which are themselves (optionally) learnable parameters. Commitment and
quantization MSE losses pull encoder and values together.

The per-dimension |z - v| argmin is a broadcasted compare over the level
axis — a pure VPU op, no codebook matmul needed.
"""

from __future__ import annotations

import math
from itertools import accumulate

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import default

sg = jax.lax.stop_gradient


class LatentQuantize(ModeModule):
    def __init__(
        self,
        levels: list[int] | int,
        dim: int,
        commitment_loss_weight: float = 0.1,
        quantization_loss_weight: float = 0.1,
        num_codebooks: int = 1,
        codebook_dim: int = -1,
        keep_num_codebooks_dim: bool | None = None,
        optimize_values: bool = True,
        in_place_codebook_optimizer: optax.GradientTransformation | None = None,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        self.dim = dim

        if isinstance(levels, int):
            assert codebook_dim > 0, (
                'codebook_dim must be set when levels is a scalar'
            )
            levels = [levels] * codebook_dim
        self.levels = tuple(int(l) for l in levels)
        self.basis = tuple(accumulate((1,) + self.levels[:-1], lambda a, b: a * b))

        self.commitment_loss_weight = commitment_loss_weight
        self.quantization_loss_weight = quantization_loss_weight

        self.codebook_dim = codebook_dim if codebook_dim > 0 else len(self.levels)

        effective_codebook_dim = self.codebook_dim * num_codebooks
        self.num_codebooks = num_codebooks
        self.effective_codebook_dim = effective_codebook_dim

        keep_num_codebooks_dim = (
            keep_num_codebooks_dim if keep_num_codebooks_dim else num_codebooks > 1
        )
        assert not (num_codebooks > 1 and not keep_num_codebooks_dim)
        self.keep_num_codebooks_dim = keep_num_codebooks_dim

        has_projections = self.dim != effective_codebook_dim
        self.project_in = (
            nnx.Linear(self.dim, effective_codebook_dim, rngs=rngs)
            if has_projections else None
        )
        self.project_out = (
            nnx.Linear(effective_codebook_dim, self.dim, rngs=rngs)
            if has_projections else None
        )
        self.has_projections = has_projections

        self.codebook_size = math.prod(self.levels)

        # per-dimension level values: zero-centered, start at -0.5
        # (reference latent_quantization.py:121-126). Ragged across dims, so
        # one (learnable) leaf per dimension.
        def init_values(level: int) -> jax.Array:
            if level % 2 == 1:
                return jnp.linspace(-0.5, 0.5, level)
            return jnp.arange(level) / level - 0.5

        self.optimize_values = optimize_values
        wrap = nnx.Param if optimize_values else nnx.Variable
        self.values_per_latent = nnx.List(
            [wrap(init_values(level)) for level in self.levels]
        )

        self.in_place_codebook_optimizer = (
            nnx.Optimizer(self, in_place_codebook_optimizer, wrt=nnx.Param)
            if in_place_codebook_optimizer is not None else None
        )

    # -- codec ---------------------------------------------------------------

    def _levels_arr(self, dtype=jnp.float32):
        return jnp.asarray(self.levels, dtype)

    def _scale_and_shift(self, zhat_normalized: jax.Array) -> jax.Array:
        half_width = jnp.floor_divide(self._levels_arr(jnp.int32), 2)
        return (zhat_normalized * 2 * half_width) + half_width

    def _scale_and_shift_inverse(self, zhat: jax.Array) -> jax.Array:
        half_width = jnp.floor_divide(self._levels_arr(jnp.int32), 2)
        return (zhat - half_width) / half_width / 2

    @property
    def implicit_codebook(self) -> jax.Array:
        all_indices = jnp.arange(self.codebook_size)[..., None]
        codes_non_centered = (all_indices // jnp.asarray(self.basis, jnp.int32)) % \
            jnp.asarray(self.levels, jnp.int32)
        return self._scale_and_shift_inverse(codes_non_centered)

    def codes_to_indices(self, zhat: jax.Array) -> jax.Array:
        assert zhat.shape[-1] == self.codebook_dim
        zhat = self._scale_and_shift(zhat)
        return (zhat * jnp.asarray(self.basis, zhat.dtype)).sum(axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices: jax.Array, project_out: bool = True) -> jax.Array:
        indices = indices[..., None]
        codes_non_centered = (indices // jnp.asarray(self.basis, jnp.int32)) % \
            jnp.asarray(self.levels, jnp.int32)
        codes = self._scale_and_shift_inverse(codes_non_centered)

        if self.keep_num_codebooks_dim:
            codes = codes.reshape(*codes.shape[:-2], -1)

        if project_out and self.project_out is not None:
            codes = self.project_out(codes)

        return jnp.moveaxis(codes, -1, 1)

    # -- quantization ---------------------------------------------------------

    def quantize(self, z: jax.Array, ste: bool = True) -> jax.Array:
        """Per-dimension nearest-value quantization with STE
        (reference latent_quantization.py:148-176). NOTE: quantizes to the
        *learned* values, while the index codec uses the canonical grid —
        matching the reference's (intentional) split.

        `ste=False` returns the raw gathered values (differentiable w.r.t.
        `values_per_latent` through the gather) — used by the inner
        in-place-optimizer loss, where the STE form would zero the value
        gradients."""
        quantized_dims = []
        for i in range(self.codebook_dim):
            values = self.values_per_latent[i][...]
            dist = jnp.abs(z[..., i, None] - values)
            idx = jnp.argmin(dist, axis=-1)
            quantized_dims.append(jnp.take(values, idx))
        quantize = jnp.stack(quantized_dims, axis=-1)
        if not ste:
            return quantize
        return z + sg(quantize - z)

    def quantize_and_project(self, z: jax.Array, is_img_or_video=None, ps=None):
        """Quantize already-projected tokens and project back out.

        Mirror of the reference helper (latent_quantization.py:211-224):
        `z` is the post-`project_in` token tensor (b, n, c, d); `ps` is the
        packed original shape ((b, *spatial, dim) channel-last — our
        analogue of the reference's einops pack spec); `is_img_or_video`
        is accepted and unused, exactly as upstream. Returns
        `(codes, out, indices)` with `out` restored to channel-first layout
        and `indices` squeezed unless `keep_num_codebooks_dim`.
        """
        codes = self.quantize(z)
        indices = self.codes_to_indices(codes)
        codes = codes.reshape(*codes.shape[:-2], -1)
        out = self.project_out(codes) if self.project_out is not None else codes
        if ps is not None:
            out = out.reshape(ps)
            indices = indices.reshape(*ps[:-1], self.num_codebooks)
        out = jnp.moveaxis(out, -1, 1)
        if not self.keep_num_codebooks_dim:
            indices = indices[..., 0]
        return codes, out, indices

    # -- losses --------------------------------------------------------------

    @staticmethod
    def quantization_loss(z: jax.Array, zhat: jax.Array) -> jax.Array:
        return ((sg(zhat) - z) ** 2).mean()

    @staticmethod
    def commitment_loss(z: jax.Array, zhat: jax.Array) -> jax.Array:
        return ((sg(z) - zhat) ** 2).mean()

    # -- forward -------------------------------------------------------------

    def _quantize_tokens(self, z_tokens: jax.Array, ste: bool = True):
        """(b, N, c, d) -> (out (b, N, c*d->dim), indices (b, N, c))."""
        codes = self.quantize(z_tokens, ste=ste)
        indices = self.codes_to_indices(codes)
        codes = codes.reshape(*codes.shape[:-2], -1)
        out = self.project_out(codes) if self.project_out is not None else codes
        return out, indices

    def __call__(self, z: jax.Array):
        """Input layout is channel-first: (b, d, ...) — matching the
        reference (latent_quantization.py:239)."""
        original_input = z

        z = jnp.moveaxis(z, 1, -1)
        z_shape = z.shape                                  # (b, *spatial, dim)
        assert z_shape[-1] == self.dim, (
            f'expected dimension of {self.dim} but found {z_shape[-1]}'
        )
        z = z.reshape(z.shape[0], -1, self.dim)

        if self.project_in is not None:
            z = self.project_in(z)
        z = z.reshape(*z.shape[:-1], self.num_codebooks, self.codebook_dim)

        def finalize(out_tokens, indices_tokens):
            out = out_tokens.reshape(z_shape)
            out = jnp.moveaxis(out, -1, 1)                 # back to (b, d, ...)
            indices = indices_tokens.reshape(*z_shape[:-1], self.num_codebooks)
            if not self.keep_num_codebooks_dim:
                indices = indices[..., 0]
            return out, indices

        if self.in_place_codebook_optimizer is not None and self.training:
            # inner gradient step on the level values against commitment +
            # quantization loss, then re-quantize (reference :264-291)
            graphdef, params, rest = nnx.split(self, nnx.Param, ...)

            def inner_loss(p):
                m = nnx.merge(graphdef, p, jax.tree.map(lambda a: a, rest))
                # raw (non-STE) quantize: gradients must reach the values
                # through the gather. (The reference's equivalent path is
                # broken upstream — latent_quantization.py:264 reads a
                # never-assigned attribute — so these are the coherent
                # semantics: the inner step pulls the level values toward
                # the batch, exactly like the VQ in-place optimizer.)
                out_tokens, _ = m._quantize_tokens(z, ste=False)
                out, _ = finalize(out_tokens, jnp.zeros(z.shape[:3], jnp.int32))
                loss = jnp.asarray(0.0)
                if self.commitment_loss_weight != 0:
                    loss = loss + m.commitment_loss(original_input, out)
                if self.quantization_loss_weight != 0:
                    loss = loss + m.quantization_loss(original_input, out)
                return loss

            grads = jax.grad(inner_loss)(params)
            self.in_place_codebook_optimizer.update(self, grads)

        out_tokens, indices_tokens = self._quantize_tokens(z)
        out, indices = finalize(out_tokens, indices_tokens)

        if self.training:
            commitment_loss = (
                self.commitment_loss(original_input, out)
                if self.commitment_loss_weight != 0 else jnp.asarray(0.0)
            )
            quantization_loss = (
                self.quantization_loss(original_input, out)
                if self.quantization_loss_weight != 0 else jnp.asarray(0.0)
            )
        else:
            commitment_loss = quantization_loss = jnp.asarray(0.0)

        loss = (
            self.commitment_loss_weight * commitment_loss
            + self.quantization_loss_weight * quantization_loss
        )
        return out, indices, loss
