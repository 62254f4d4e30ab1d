"""ResidualSimVQ (component C16).

TPU-native re-design of the reference (residual_sim_vq.py:48-220): a
residual stack of SimVQ layers with masked quantize-dropout and
channel-first-aware indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import default, first
from ..quantizers.sim_vq import SimVQ

sg = jax.lax.stop_gradient


class ResidualSimVQ(ModeModule):
    def __init__(
        self,
        *,
        dim: int,
        num_quantizers: int,
        codebook_size: int,
        heads: int = 1,
        quantize_dropout: bool = False,
        quantize_dropout_cutoff_index: int = 0,
        quantize_dropout_multiple_of: int = 1,
        channel_first: bool = False,
        rotation_trick: bool = True,
        rngs: nnx.Rngs | None = None,
        **sim_vq_kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)
        assert heads == 1, 'residual vq is not compatible with multi-headed codes'

        self.channel_first = channel_first
        self.num_quantizers = num_quantizers

        self.layers = nnx.List([
            SimVQ(
                dim=dim,
                codebook_size=codebook_size,
                rotation_trick=rotation_trick,
                channel_first=channel_first,
                rngs=rngs,
                **sim_vq_kwargs,
            )
            for _ in range(num_quantizers)
        ])

        self.quantize_dropout = quantize_dropout and num_quantizers > 1
        assert quantize_dropout_cutoff_index >= 0
        self.quantize_dropout_cutoff_index = quantize_dropout_cutoff_index
        self.quantize_dropout_multiple_of = quantize_dropout_multiple_of
        self.rngs = rngs

    @property
    def codebook_size(self):
        return first(self.layers).codebook_size

    @property
    def codebook_dim(self):
        return first(self.layers).codebook_dim

    @property
    def codebooks(self) -> jax.Array:
        return jnp.stack([layer.codebook for layer in self.layers])

    def get_codes_from_indices(self, indices: jax.Array) -> jax.Array:
        """(b, ..., q) -> (q, b, ..., d) (channel-first: (q, b, d, ...))."""
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

        layer0 = self.layers[0]
        if getattr(layer0, 'code_axis', None) is not None \
                and layer0._code_parallel():
            # row-sharded frozen codebooks: psum'd sharded gather per layer
            from ..parallel.shard import sharded_gather_codes

            all_codes = jax.vmap(
                lambda cb, i: sharded_gather_codes(cb, i, layer0.code_axis),
                in_axes=(0, 2),
            )(self.codebooks, ind)                           # (q, b, n, d)
        else:
            all_codes = jax.vmap(
                lambda cb, i: jnp.take(cb, i, axis=0), in_axes=(0, 2)
            )(self.codebooks, ind)                           # (q, b, n, d)

        all_codes = jnp.where(
            jnp.moveaxis(dropout_mask, -1, 0)[..., None], 0.0, all_codes
        )
        all_codes = all_codes.reshape(self.num_quantizers, *lead_shape, -1)

        if self.channel_first:
            all_codes = jnp.moveaxis(all_codes, -1, 2)
        return all_codes

    def get_output_from_indices(self, indices: jax.Array) -> jax.Array:
        all_codes = self.get_codes_from_indices(indices)
        return all_codes.sum(axis=0)

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
        return_all_codes: bool = False,
        rand_quantize_dropout_index: jax.Array | None = None,
    ):
        quantized_out = jnp.zeros_like(x)
        residual = x

        all_losses = []
        all_indices = []

        dropout_index = None
        if self.training and self.quantize_dropout:
            dropout_index = default(
                rand_quantize_dropout_index, self._draw_dropout_index()
            )

        for quantizer_index, sim_vq in enumerate(self.layers):
            quantized, indices, loss = sim_vq(residual)

            if dropout_index is not None:
                keep = quantizer_index <= dropout_index
                quantized = jnp.where(keep, quantized, 0.0)
                indices = jnp.where(keep, indices, -1)
                loss = jnp.where(keep, loss, 0.0)

            residual = residual - sg(quantized)
            quantized_out = quantized_out + quantized

            all_indices.append(indices)
            all_losses.append(loss)

        all_losses = jnp.stack(all_losses, axis=-1)
        all_indices = jnp.stack(all_indices, axis=-1)

        ret = (quantized_out, all_indices, all_losses)
        if not return_all_codes:
            return ret
        return (*ret, self.get_codes_from_indices(all_indices))
