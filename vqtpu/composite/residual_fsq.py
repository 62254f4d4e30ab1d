"""ResidualFSQ / GroupedResidualFSQ (component C13).

TPU-native re-design of the reference (residual_fsq.py:49-350): a residual
stack of FSQ layers with per-layer scale levels^-ind, forced
symmetry-preserving hard-clamp quantization, an automatic soft input clamp
of 1 + 1/(L-1), and masked quantize-dropout (same static-graph treatment as
ResidualVQ).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import default, exists, first
from ..quantizers.fsq import FSQ

sg = jax.lax.stop_gradient


class ResidualFSQ(ModeModule):
    def __init__(
        self,
        *,
        levels: list[int],
        num_quantizers: int,
        dim: int | None = None,
        is_channel_first: bool = False,
        quantize_dropout: bool = False,
        quantize_dropout_cutoff_index: int = 0,
        quantize_dropout_multiple_of: int = 1,
        soft_clamp_input_value: float | list[float] | None = None,
        bound_hard_clamp: bool = True,
        eval_fused: str = 'auto',
        rngs: nnx.Rngs | None = None,
        **kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        codebook_dim = len(levels)
        dim = default(dim, codebook_dim)

        requires_projection = codebook_dim != dim
        self.project_in = (
            nnx.Linear(dim, codebook_dim, rngs=rngs) if requires_projection else None
        )
        self.project_out = (
            nnx.Linear(codebook_dim, dim, rngs=rngs) if requires_projection else None
        )
        self.has_projections = requires_projection

        self.is_channel_first = is_channel_first
        self.num_quantizers = num_quantizers

        self.levels = tuple(int(l) for l in levels)
        assert all(l > 1 for l in self.levels)

        self.layers = nnx.List([
            FSQ(
                levels=list(levels),
                dim=codebook_dim,
                preserve_symmetry=True,
                bound_hard_clamp=bound_hard_clamp,
                rngs=rngs,
                **kwargs,
            )
            for _ in range(num_quantizers)
        ])
        assert all(not fsq.has_projections for fsq in self.layers)

        self.codebook_size = self.layers[0].codebook_size

        self.quantize_dropout = quantize_dropout and num_quantizers > 1
        assert quantize_dropout_cutoff_index >= 0
        self.quantize_dropout_cutoff_index = quantize_dropout_cutoff_index
        self.quantize_dropout_multiple_of = quantize_dropout_multiple_of

        # soft-clamp bound: 1 + 1/(L-1) with hard-clamp quantization
        # (reference residual_fsq.py:116-118)
        if bound_hard_clamp:
            assert not exists(soft_clamp_input_value)
            soft_clamp_input_value = [
                1.0 + 1.0 / (l - 1) for l in self.levels
            ]
        if isinstance(soft_clamp_input_value, float):
            soft_clamp_input_value = [soft_clamp_input_value] * codebook_dim
        self.soft_clamp_input_value = (
            tuple(soft_clamp_input_value) if soft_clamp_input_value is not None
            else None
        )

        # fused-eval Pallas sweep (kernels/residual_fsq_fused.py),
        # r5-certified DEAD-END for the default path: the kernel itself
        # beats the XLA loop (1.23 vs 2.2 ms at q=8, d=4, 4.2M tokens)
        # but feeding it requires materializing the (N, d) tokens in the
        # (N*d/128, 128) full-lane layout, and that retiling copy costs
        # ~9 ms on v5e (~140x off bandwidth) — end-to-end 10.4 ms, 0.21x
        # (tools/tpu_r5_logs/rfsq_fused_ab.log, rfsq_glue_breakdown.log).
        # 'auto' therefore ALWAYS takes the unrolled XLA loop; 'on' is a
        # verified escape hatch (bit-identical on silicon; off-TPU,
        # jit-fusion FMA differences can flip deep-layer bin-edge
        # indices — decoded reconstructions agree to one deepest-layer
        # quantum) for callers whose data already lives in the packed
        # layout or for future hardware with faster relayouts.
        assert eval_fused in ('auto', 'on', 'off')
        self.eval_fused = eval_fused
        self.rngs = rngs

    def _scales(self) -> jax.Array:
        """(q, d) per-layer scales: levels^-ind (reference :88-89)."""
        levels = jnp.asarray(self.levels, jnp.float32)
        exps = jnp.arange(self.num_quantizers, dtype=jnp.float32)
        return levels[None, :] ** -exps[:, None]

    @property
    def codebooks(self) -> jax.Array:
        return jnp.stack([layer.implicit_codebook for layer in self.layers])

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
        )(self.codebooks, ind)                               # (q, b, n, d)

        all_codes = jnp.where(
            jnp.moveaxis(dropout_mask, -1, 0)[..., None], 0.0, all_codes
        )
        all_codes = all_codes * self._scales()[:, None, None, :]
        return all_codes.reshape(self.num_quantizers, *lead_shape, -1)

    def get_output_from_indices(self, indices: jax.Array) -> jax.Array:
        codes = self.get_codes_from_indices(indices)
        summed = codes.sum(axis=0)
        if self.project_out is not None:
            summed = self.project_out(summed)
        return summed

    def _fused_eval_ok(self) -> bool:
        """Route this eval forward through the fused Pallas sweep?

        Only with `eval_fused='on'` (explicit opt-in — 'auto' is the XLA
        loop permanently, see the ctor comment), in eval mode, on the
        ResidualFSQ configuration proper (preserve-symmetry hard-clamp
        FSQ stack, single codebook, no inner projections/rotation,
        f32-forced, indices on). Any other configuration silently keeps
        the unrolled loop.
        """
        if self.eval_fused != 'on' or self.training:
            return False
        if self.soft_clamp_input_value is None:
            return False
        l0 = self.layers[0]
        return (
            l0.preserve_symmetry and l0.bound_hard_clamp
            and l0.num_codebooks == 1 and not l0.keep_num_codebooks_dim
            and l0.return_indices and l0.force_quantization_f32
            and not l0.orthogonal_rotation and not l0.has_projections
        )

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
        if self.is_channel_first:
            chan_shape = x.shape
            x = jnp.moveaxis(x, 1, -1)
            spatial = x.shape[1:-1]
            x = x.reshape(x.shape[0], -1, x.shape[-1])

        if self.project_in is not None:
            x = self.project_in(x)

        if self._fused_eval_ok():
            from ..kernels.residual_fsq_fused import fused_residual_fsq_eval
            quantized_out, all_indices = fused_residual_fsq_eval(
                x, self._scales(), levels=self.levels,
                clamp=self.soft_clamp_input_value,
                num_quantizers=self.num_quantizers,
                interpret=jax.default_backend() != 'tpu',
            )
        else:
            if self.soft_clamp_input_value is not None:
                clamp = jnp.asarray(self.soft_clamp_input_value, x.dtype)
                x = jnp.tanh(x / clamp) * clamp

            quantized_out = jnp.zeros_like(x)
            residual = x

            all_indices = []

            should_dropout = self.training and self.quantize_dropout
            dropout_index = None
            if should_dropout:
                dropout_index = default(
                    rand_quantize_dropout_index, self._draw_dropout_index()
                )

            scales = self._scales()
            orig_dtype = x.dtype
            residual = residual.astype(jnp.float32)
            quantized_out = quantized_out.astype(jnp.float32)

            for quantizer_index, layer in enumerate(self.layers):
                scale = scales[quantizer_index]

                quantized, indices = layer(residual / scale)
                quantized = quantized.astype(jnp.float32) * scale

                if dropout_index is not None:
                    keep = quantizer_index <= dropout_index
                    quantized = jnp.where(keep, quantized, 0.0)
                    indices = jnp.where(keep, indices, -1)

                residual = residual - sg(quantized)
                quantized_out = quantized_out + quantized

                all_indices.append(indices)

            quantized_out = quantized_out.astype(orig_dtype)
            all_indices = jnp.stack(all_indices, axis=-1)

        if self.project_out is not None:
            quantized_out = self.project_out(quantized_out)

        if self.is_channel_first:
            quantized_out = quantized_out.reshape(
                quantized_out.shape[0], *spatial, -1
            )
            quantized_out = jnp.moveaxis(quantized_out, -1, 1)
            all_indices = all_indices.reshape(
                all_indices.shape[0], *spatial, -1
            )
            all_indices = jnp.moveaxis(all_indices, -1, 1)

        ret = (quantized_out, all_indices)
        if not return_all_codes:
            return ret
        return (*ret, self.get_codes_from_indices(all_indices))


class GroupedResidualFSQ(ModeModule):
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
            ResidualFSQ(dim=dim_per_group, rngs=rngs, **kwargs)
            for _ in range(groups)
        ])
        self.codebook_size = self.rvqs[0].codebook_size
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

    def __call__(self, x: jax.Array, return_all_codes: bool = False):
        assert x.shape[self.split_dim] == self.dim
        chunks = jnp.split(x, self.groups, axis=self.split_dim)

        shared_dropout_index = None
        if self.training and first(self.rvqs).quantize_dropout:
            shared_dropout_index = first(self.rvqs)._draw_dropout_index()

        out = tuple(
            rvq(chunk, return_all_codes=return_all_codes,
                rand_quantize_dropout_index=shared_dropout_index)
            for rvq, chunk in zip(self.rvqs, chunks)
        )
        out = tuple(zip(*out))

        quantized, all_indices, *maybe_all_codes = out
        quantized = jnp.concatenate(quantized, axis=self.split_dim)
        all_indices = jnp.stack(all_indices)

        return (quantized, all_indices, *maybe_all_codes)
