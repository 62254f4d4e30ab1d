"""FSQ — Finite Scalar Quantization (component C9).

https://arxiv.org/abs/2309.15505 ("VQ-VAE Made Simple"). TPU-native
re-design of the reference FSQ (finite_scalar_quantization.py:64-320):
per-dimension scalar quantization onto a fixed grid of levels, with a
mixed-radix index codec. Entirely stateless (the "codebook" is implicit
arithmetic), so it shards trivially under pjit; the only state is the
optional projection params and the optional orthogonal rotation buffer.

Level tensors are kept as static python tuples and materialized as XLA
constants inside the traced function — nothing to checkpoint, mirroring the
reference's non-persistent buffers (finite_scalar_quantization.py:90-93).
"""

from __future__ import annotations

import math
from itertools import accumulate

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.module import ModeModule
from ..core.layout import to_tokens
from ..core.ste import round_ste, floor_ste
from ..core.utils import default, exists


class FSQ(ModeModule):
    def __init__(
        self,
        levels: list[int] | tuple[int, ...],
        dim: int | None = None,
        num_codebooks: int = 1,
        keep_num_codebooks_dim: bool | None = None,
        scale: float | None = None,
        channel_first: bool = False,
        projection_has_bias: bool = True,
        return_indices: bool = True,
        force_quantization_f32: bool = True,
        allowed_dtypes: tuple = ('float32', 'float64'),
        preserve_symmetry: bool = False,
        noise_dropout: float = 0.0,
        bound_hard_clamp: bool = False,
        orthogonal_rotation: bool = False,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        assert not (any(l == 2 for l in levels) and not preserve_symmetry), (
            'turn on `preserve_symmetry` for using any levels == 2, '
            'or use a greater level'
        )
        assert not (noise_dropout > 0 and not preserve_symmetry)

        self.levels = tuple(int(l) for l in levels)
        # mixed-radix basis: index = sum_i digit_i * basis_i
        self.basis = tuple(accumulate((1,) + self.levels[:-1], lambda a, b: a * b))

        self.scale = scale
        self.preserve_symmetry = preserve_symmetry
        self.noise_dropout = noise_dropout
        self.bound_hard_clamp = bound_hard_clamp

        codebook_dim = len(self.levels)
        self.codebook_dim = codebook_dim

        effective_codebook_dim = codebook_dim * num_codebooks
        self.num_codebooks = num_codebooks
        self.effective_codebook_dim = effective_codebook_dim

        keep_num_codebooks_dim = default(keep_num_codebooks_dim, num_codebooks > 1)
        assert not (num_codebooks > 1 and not keep_num_codebooks_dim)
        self.keep_num_codebooks_dim = keep_num_codebooks_dim

        self.dim = default(dim, codebook_dim * num_codebooks)
        self.channel_first = channel_first

        has_projections = self.dim != effective_codebook_dim
        self.project_in = (
            nnx.Linear(self.dim, effective_codebook_dim,
                       use_bias=projection_has_bias, rngs=rngs)
            if has_projections else None
        )
        self.project_out = (
            nnx.Linear(effective_codebook_dim, self.dim,
                       use_bias=projection_has_bias, rngs=rngs)
            if has_projections else None
        )
        self.has_projections = has_projections

        self.return_indices = return_indices
        self.codebook_size = math.prod(self.levels)

        self.force_quantization_f32 = force_quantization_f32
        # normalize to dtypes; accepts strings or dtype objects
        self.allowed_dtypes = tuple(np.dtype(d) for d in allowed_dtypes)

        self.orthogonal_rotation = orthogonal_rotation
        if orthogonal_rotation:
            is_symmetric = len(set(self.levels)) == 1
            if not is_symmetric:
                import warnings
                warnings.warn(
                    'orthogonal_rotation is not recommended for FSQ with '
                    'asymmetric levels'
                )
            rot = jax.random.orthogonal(rngs.params(), codebook_dim)
            self.orthogonal_rot = nnx.Variable(rot.astype(jnp.float32))

        self.rngs = rngs

    # -- level constants -----------------------------------------------------

    def _levels_arr(self, dtype=jnp.float32) -> jax.Array:
        return jnp.asarray(self.levels, dtype=dtype)

    def _basis_arr(self, dtype=jnp.int32) -> jax.Array:
        return jnp.asarray(self.basis, dtype=dtype)

    @property
    def implicit_codebook(self) -> jax.Array:
        """All codebook vectors, derived arithmetically (reference
        finite_scalar_quantization.py:124-127). Recomputed, not stored."""
        indices = jnp.arange(self.codebook_size)
        return self._indices_to_codes(indices)

    # -- quantization --------------------------------------------------------

    def bound(self, z: jax.Array, eps: float = 1e-3, hard_clamp: bool = False) -> jax.Array:
        """Bound z into the level grid then round with STE (reference
        finite_scalar_quantization.py:147-157)."""
        levels = self._levels_arr()
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        if hard_clamp:
            shift = offset / half_l
            bounded_z = jnp.clip(z + shift, -1.0, 1.0) * half_l - offset
        else:
            shift = jnp.arctanh(offset / half_l)
            bounded_z = jnp.tanh(z + shift) * half_l - offset
        half_width = jnp.floor_divide(levels, 2).astype(z.dtype)
        return round_ste(bounded_z) / half_width

    def symmetry_preserving_bound(self, z: jax.Array, hard_clamp: bool = False) -> jax.Array:
        """QL(x) = 2 / (L-1) * [(L-1) * (tanh(x) + 1) / 2 + 0.5] - 1
        (section 3.2, https://arxiv.org/abs/2411.19842; reference :161-169)."""
        levels_minus_1 = self._levels_arr() - 1
        scale = 2.0 / levels_minus_1
        bounded = jnp.clip(z, -1.0, 1.0) if hard_clamp else jnp.tanh(z)
        bracket = (levels_minus_1 * (bounded + 1) / 2.0) + 0.5
        bracket = floor_ste(bracket)
        return scale * bracket - 1.0

    def quantize(self, z: jax.Array) -> jax.Array:
        bound_fn = (
            self.symmetry_preserving_bound if self.preserve_symmetry else self.bound
        )
        return bound_fn(z, hard_clamp=self.bound_hard_clamp)

    def maybe_apply_noise(self, bounded_z: jax.Array) -> jax.Array:
        """Elementwise in-bin noise regularization (reference :179-193)."""
        if not self.training or self.noise_dropout == 0.0:
            return bounded_z
        key_mask, key_offset = jax.random.split(self.rngs.noise())
        offset_mask = jax.random.bernoulli(
            key_mask, self.noise_dropout, bounded_z.shape
        )
        offset = jax.random.uniform(key_offset, bounded_z.shape,
                                    dtype=bounded_z.dtype) - 0.5
        out = jnp.where(offset_mask, bounded_z + offset, bounded_z)
        return jnp.clip(out, -1.0, 1.0)

    # -- index codec -------------------------------------------------------------

    def _scale_and_shift(self, zhat_normalized: jax.Array) -> jax.Array:
        levels = self._levels_arr(zhat_normalized.dtype)
        if self.preserve_symmetry:
            return (zhat_normalized + 1.0) / (2.0 / (levels - 1))
        half_width = jnp.floor_divide(levels, 2)
        return (zhat_normalized * half_width) + half_width

    def _scale_and_shift_inverse(self, zhat: jax.Array) -> jax.Array:
        levels = self._levels_arr(jnp.float32)
        if self.preserve_symmetry:
            return zhat * (2.0 / (levels - 1)) - 1.0
        half_width = jnp.floor_divide(levels, 2)
        return (zhat - half_width) / half_width

    def indices_to_level_indices(self, indices: jax.Array) -> jax.Array:
        """Mixed-radix decomposition: per-dimension digit indices
        (reference :214-218)."""
        indices = indices[..., None]
        return (indices // self._basis_arr()) % jnp.asarray(self.levels, jnp.int32)

    def _indices_to_codes(self, indices: jax.Array) -> jax.Array:
        return self._scale_and_shift_inverse(
            self.indices_to_level_indices(indices).astype(jnp.float32)
        )

    def codes_to_indices(self, zhat: jax.Array) -> jax.Array:
        assert zhat.shape[-1] == self.codebook_dim
        zhat = self._scale_and_shift(zhat)
        return jnp.round(
            (zhat * self._basis_arr().astype(zhat.dtype)).sum(axis=-1)
        ).astype(jnp.int32)

    def indices_to_codes(self, indices: jax.Array) -> jax.Array:
        """Decode indices back to (projected) codes (reference :226-245)."""
        assert exists(indices)
        is_img_or_video = indices.ndim >= (3 + int(self.keep_num_codebooks_dim))

        codes = self._indices_to_codes(indices)

        if self.orthogonal_rotation:
            codes = codes @ self.orthogonal_rot[...].T

        if self.keep_num_codebooks_dim:
            codes = codes.reshape(*codes.shape[:-2], -1)

        if self.project_out is not None:
            codes = self.project_out(codes)

        if is_img_or_video or self.channel_first:
            codes = jnp.moveaxis(codes, -1, 1)

        return codes

    # -- forward --------------------------------------------------------------

    def __call__(self, z: jax.Array) -> tuple[jax.Array, jax.Array | None]:
        is_img_or_video = z.ndim >= 4
        need_move_channel_last = is_img_or_video or self.channel_first

        if need_move_channel_last:
            z, layout = to_tokens(z, channel_first=True)
        assert z.shape[-1] == self.dim, (
            f'expected dimension of {self.dim} but found {z.shape[-1]}'
        )

        if self.project_in is not None:
            z = self.project_in(z)

        b, n = z.shape[:2]
        z = z.reshape(b, n, self.num_codebooks, self.codebook_dim)

        if self.orthogonal_rotation:
            z = z @ self.orthogonal_rot[...]

        # force the quantization region to f32 unless the incoming dtype is
        # whitelisted (reference finite_scalar_quantization.py:276-301)
        orig_dtype = z.dtype
        if self.force_quantization_f32 and orig_dtype not in self.allowed_dtypes:
            z = z.astype(jnp.float32)

        codes = self.quantize(z)

        indices = None
        if self.return_indices:
            indices = self.codes_to_indices(codes)

        codes = self.maybe_apply_noise(codes)

        if self.orthogonal_rotation:
            codes = codes @ self.orthogonal_rot[...].T

        codes = codes.reshape(b, n, -1)
        codes = codes.astype(orig_dtype)

        out = self.project_out(codes) if self.project_out is not None else codes

        if need_move_channel_last:
            out = layout.restore(out)
            if indices is not None:
                indices = layout.restore_indices(indices)

        if not self.keep_num_codebooks_dim and self.return_indices:
            indices = indices[..., 0]

        return out, indices
