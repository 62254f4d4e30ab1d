"""ResidualLFQ / GroupedResidualLFQ (component C12).

TPU-native re-design of the reference (residual_lfq.py:44-292): a residual
stack of LFQ layers with codebook_scale = 2^-layer and a halving soft input
clamp, plus masked quantize-dropout (static graph, see ResidualVQ).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import default, exists, first
from ..quantizers.lfq import LFQ

sg = jax.lax.stop_gradient


class ResidualLFQ(ModeModule):
    def __init__(
        self,
        *,
        dim: int,
        num_quantizers: int,
        codebook_size: int,
        quantize_dropout: bool = False,
        quantize_dropout_cutoff_index: int = 0,
        quantize_dropout_multiple_of: int = 1,
        soft_clamp_input_value: float | None = None,
        rngs: nnx.Rngs | None = None,
        **kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        codebook_dim = int(math.log2(codebook_size))

        requires_projection = codebook_dim != dim
        self.project_in = (
            nnx.Linear(dim, codebook_dim, rngs=rngs) if requires_projection else None
        )
        self.project_out = (
            nnx.Linear(codebook_dim, dim, rngs=rngs) if requires_projection else None
        )
        self.has_projections = requires_projection

        self.num_quantizers = num_quantizers

        layers = []
        for ind in range(num_quantizers):
            codebook_scale = 2 ** -ind
            layers.append(LFQ(
                dim=codebook_dim,
                codebook_scale=codebook_scale,
                soft_clamp_input_value=soft_clamp_input_value,
                rngs=rngs,
                **kwargs,
            ))
            if exists(soft_clamp_input_value):
                soft_clamp_input_value *= 0.5
        self.layers = nnx.List(layers)
        assert all(not lfq.has_projections for lfq in self.layers)

        self.quantize_dropout = quantize_dropout and num_quantizers > 1
        assert quantize_dropout_cutoff_index >= 0
        self.quantize_dropout_cutoff_index = quantize_dropout_cutoff_index
        self.quantize_dropout_multiple_of = quantize_dropout_multiple_of
        self.rngs = rngs

    @property
    def codebooks(self) -> jax.Array:
        return jnp.stack([layer.codebook for layer in self.layers])

    def get_codes_from_indices(self, indices: jax.Array) -> jax.Array:
        lead_shape = indices.shape[:-1]
        quantize_dim = indices.shape[-1]
        ind = indices.reshape(indices.shape[0], -1, quantize_dim)

        if quantize_dim < self.num_quantizers:
            assert self.quantize_dropout, (
                'quantize dropout must be greater than 0 if you wish to '
                'reconstruct from a signal with less fine quantizations'
            )
            ind = jnp.pad(
                ind, ((0, 0), (0, 0), (0, self.num_quantizers - quantize_dim)),
                constant_values=-1,
            )

        dropout_mask = ind == -1
        ind = jnp.where(dropout_mask, 0, ind)

        all_codes = jax.vmap(
            lambda cb, i: jnp.take(cb, i, axis=0), in_axes=(0, 2)
        )(self.codebooks, ind)

        all_codes = jnp.where(
            jnp.moveaxis(dropout_mask, -1, 0)[..., None], 0.0, all_codes
        )
        return all_codes.reshape(self.num_quantizers, *lead_shape, -1)

    def get_output_from_indices(self, indices: jax.Array) -> jax.Array:
        codes = self.get_codes_from_indices(indices)
        summed = codes.sum(axis=0)
        if self.project_out is not None:
            summed = self.project_out(summed)
        return summed

    def _draw_dropout_index(self) -> jax.Array:
        key = self.rngs.dropout()
        idx = jax.random.randint(
            key, (), self.quantize_dropout_cutoff_index, self.num_quantizers
        )
        mult = self.quantize_dropout_multiple_of
        if mult != 1:
            idx = jnp.ceil((idx + 1) / mult).astype(jnp.int32) * mult - 1
            idx = jnp.minimum(idx, self.num_quantizers - 1)
        return idx

    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array | None = None,
        return_all_codes: bool = False,
        rand_quantize_dropout_index: jax.Array | None = None,
    ):
        if self.project_in is not None:
            x = self.project_in(x)

        quantized_out = jnp.zeros_like(x, dtype=jnp.float32)
        residual = x.astype(jnp.float32)

        all_losses = []
        all_indices = []

        should_dropout = self.training and self.quantize_dropout
        dropout_index = None
        if should_dropout:
            dropout_index = default(
                rand_quantize_dropout_index, self._draw_dropout_index()
            )

        for quantizer_index, layer in enumerate(self.layers):
            quantized, indices, loss = layer(residual, mask=mask)
            quantized = quantized.astype(jnp.float32)

            if dropout_index is not None:
                keep = quantizer_index <= dropout_index
                quantized = jnp.where(keep, quantized, 0.0)
                indices = jnp.where(keep, indices, -1)
                loss = jnp.where(keep, loss, 0.0)

            residual = residual - sg(quantized)
            quantized_out = quantized_out + quantized

            all_indices.append(indices)
            all_losses.append(loss)

        quantized_out = quantized_out.astype(x.dtype)
        if self.project_out is not None:
            quantized_out = self.project_out(quantized_out)

        all_losses = jnp.stack(all_losses, axis=-1)
        all_indices = jnp.stack(all_indices, axis=-1)

        ret = (quantized_out, all_indices, all_losses)
        if not return_all_codes:
            return ret
        return (*ret, self.get_codes_from_indices(all_indices))


class GroupedResidualLFQ(ModeModule):
    def __init__(
        self,
        *,
        dim: int,
        groups: int = 1,
        accept_image_fmap: bool = False,
        rngs: nnx.Rngs | None = None,
        **kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)
        self.dim = dim
        self.groups = groups
        assert (dim % groups) == 0
        dim_per_group = dim // groups
        self.accept_image_fmap = accept_image_fmap

        self.rvqs = nnx.List([
            ResidualLFQ(dim=dim_per_group, rngs=rngs, **kwargs)
            for _ in range(groups)
        ])
        self.rngs = rngs

    @property
    def codebooks(self):
        return jnp.stack([rvq.codebooks for rvq in self.rvqs])

    @property
    def split_dim(self):
        return 1 if self.accept_image_fmap else -1

    def get_codes_from_indices(self, indices):
        return jnp.stack([
            rvq.get_codes_from_indices(chunk)
            for rvq, chunk in zip(self.rvqs, indices)
        ])

    def get_output_from_indices(self, indices):
        outputs = [
            rvq.get_output_from_indices(chunk)
            for rvq, chunk in zip(self.rvqs, indices)
        ]
        return jnp.concatenate(outputs, axis=self.split_dim)

    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array | None = None,
        return_all_codes: bool = False,
    ):
        assert x.shape[self.split_dim] == self.dim
        chunks = jnp.split(x, self.groups, axis=self.split_dim)

        shared_dropout_index = None
        if self.training and first(self.rvqs).quantize_dropout:
            shared_dropout_index = first(self.rvqs)._draw_dropout_index()

        out = tuple(
            rvq(chunk, mask=mask, return_all_codes=return_all_codes,
                rand_quantize_dropout_index=shared_dropout_index)
            for rvq, chunk in zip(self.rvqs, chunks)
        )
        out = tuple(zip(*out))

        quantized, all_indices, commit_losses, *maybe_all_codes = out
        quantized = jnp.concatenate(quantized, axis=self.split_dim)
        all_indices = jnp.stack(all_indices)
        commit_losses = jnp.stack(commit_losses)

        return (quantized, all_indices, commit_losses, *maybe_all_codes)
