"""FSP — Finite Scalar Perturbation (component C10).

https://arxiv.org/abs/2602.17133 (VP-VAE). TPU-native re-design of the
reference FSP (finite_scalar_perturbation.py:204-363): each scalar maps to
[0, 1] through a CDF activation, quantizes into bins (midpoint + STE), and
during training is stochastically perturbed within its bin at rate
(1 - quantize_rate). A VectorNorm moment-matching regularizer keeps the
pre-activation distribution near the activation's natural scale.

Pure function + PRNG-keyed perturbation; batch moments are plain reductions
(psum-able if callers shard the batch — see SURVEY.md §5.7).
"""

from __future__ import annotations

import math
from itertools import accumulate
from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..parallel import collectives
from ..core.utils import default

sg = jax.lax.stop_gradient

_SQRT2 = math.sqrt(2.0)

# CDF activations: (-inf, inf) -> [0, 1], with inverses
# (reference finite_scalar_perturbation.py:31-87)
_CDF_REGISTRY: dict[str, tuple[Callable, Callable]] = {
    'tanh': (
        lambda z: (jnp.tanh(z) + 1.0) / 2.0,
        lambda p: jnp.arctanh(p * 2.0 - 1.0),
    ),
    'sigmoid': (
        jax.nn.sigmoid,
        lambda p: jnp.log(p) - jnp.log1p(-p),
    ),
    'normal': (
        lambda z: (1.0 + jax.lax.erf(z / _SQRT2)) / 2.0,
        lambda p: jax.lax.erf_inv(2.0 * p - 1.0) * _SQRT2,
    ),
    'laplace': (
        lambda z: 0.5 * (1.0 + jnp.sign(z) * (1.0 - jnp.exp(-jnp.abs(z)))),
        lambda p: -jnp.sign(p - 0.5) * jnp.log(1.0 - 2.0 * jnp.abs(p - 0.5)),
    ),
    'cauchy': (
        lambda z: jnp.arctan(z) / jnp.pi + 0.5,
        lambda p: jnp.tan((p - 0.5) * jnp.pi),
    ),
}


def build_cdf_act(act_name: str) -> tuple[Callable, Callable]:
    assert act_name in _CDF_REGISTRY, (
        f'CDF activation {act_name} not available: {list(_CDF_REGISTRY)}'
    )
    return _CDF_REGISTRY[act_name]


def batch_stats(batch: jax.Array, eps: float = 1e-8,
                sync_axis: str | None = None):
    """(n, d) -> per-dim mean, variance (unbiased), skewness, excess
    kurtosis (reference :93-99). With `sync_axis`, the moments are computed
    over the GLOBAL batch across data-parallel shards (psum'd sums —
    SURVEY.md D1/C10: the reference has no distributed FSP; this is the
    TPU-native extension)."""
    n = batch.shape[0] * collectives.axis_size(sync_axis)
    mean = collectives.psum(batch.sum(axis=0), sync_axis) / n
    centered = batch - mean
    variance = collectives.psum(
        (centered ** 2).sum(axis=0), sync_axis) / max(n - 1, 1)
    std = jnp.maximum(jnp.sqrt(variance), eps)
    z = centered / std
    skewness = collectives.psum((z ** 3).sum(axis=0), sync_axis) / n
    kurtosis = collectives.psum((z ** 4).sum(axis=0), sync_axis) / n - 3.0
    return mean, variance, skewness, kurtosis


class VectorNorm(nnx.Module):
    """Moment-matching regularizer over the batch distribution
    (reference finite_scalar_perturbation.py:105-198)."""

    def __init__(
        self,
        l1_target: float = 0.0, l1_weight: float = 0.1,
        l2_target: float = 1.0, l2_weight: float = 0.07,
        l3_target: float = 0.0, l3_weight: float = 0.06,
        l4_target: float = 0.0, l4_weight: float = 0.05,
        eps: float = 1e-8,
    ):
        self.l1_target, self.l1_weight = l1_target, l1_weight
        self.l2_target, self.l2_weight = l2_target, l2_weight
        self.l3_target, self.l3_weight = l3_target, l3_weight
        self.l4_target, self.l4_weight = l4_target, l4_weight
        self.eps = eps
        self.sync_axis = None          # set by FSP when data-parallel

    def __call__(self, z: jax.Array) -> tuple[jax.Array, dict]:
        mean, variance, skewness, kurtosis = batch_stats(
            z, self.eps, self.sync_axis)
        norm_loss = (
            ((mean - self.l1_target) ** 2).mean() * self.l1_weight
            + ((variance - self.l2_target) ** 2).mean() * self.l2_weight
            + ((skewness - self.l3_target) ** 2).mean() * self.l3_weight
            + ((kurtosis - self.l4_target) ** 2).mean() * self.l4_weight
        )
        return norm_loss, {
            'mean': mean, 'variance': variance,
            'skewness': skewness, 'kurtosis': kurtosis,
        }

    PRESETS = {
        'none': dict(l1_weight=0.0, l2_weight=0.0, l3_weight=0.0, l4_weight=0.0),
        'var': dict(l1_target=0.0, l1_weight=0.1, l2_target=1.0, l2_weight=0.07,
                    l3_weight=0.0, l4_weight=0.0),
        'kurt': dict(l1_target=0.0, l1_weight=0.1, l2_target=1.0, l2_weight=0.07,
                     l3_target=0.0, l3_weight=0.06, l4_target=0.0, l4_weight=0.05),
        'var_tanh': dict(l1_target=0.0, l1_weight=0.1, l2_target=0.8225,
                         l2_weight=0.07, l3_weight=0.0, l4_weight=0.0),
        'var_sigmoid': dict(l1_target=0.0, l1_weight=0.1, l2_target=3.29,
                            l2_weight=0.07, l3_weight=0.0, l4_weight=0.0),
        'var_laplace': dict(l1_target=0.0, l1_weight=0.1, l2_target=2.0,
                            l2_weight=0.07, l3_weight=0.0, l4_weight=0.0),
    }

    @classmethod
    def build(cls, name: str) -> 'VectorNorm':
        assert name in cls.PRESETS, (
            f'unknown vector_norm preset: {name}, available: {list(cls.PRESETS)}'
        )
        return cls(**cls.PRESETS[name])


# variance renorm so q_z.var() -> 1 for the linear decode path: the bin
# midpoints are uniform on [0,1] with std 1/sqrt(12) (reference :348)
_UNIFORM_STD = 0.28867513459481287


class FSP(ModeModule):
    def __init__(
        self,
        levels: list[int] | tuple[int, ...],
        dim: int | None = None,
        channel_first: bool = False,
        projection_has_bias: bool = True,
        act_name: str = 'tanh',
        quantize_rate: float = 0.0,
        need_inv_act: bool = False,
        vector_norm: str = 'var_tanh',
        sync_axis: str | None = None,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        assert 0.0 <= quantize_rate <= 1.0, (
            f'quantize_rate must be in [0.0, 1.0], got {quantize_rate}'
        )

        self.levels = tuple(int(l) for l in levels)
        self.basis = tuple(accumulate((1,) + self.levels[:-1], lambda a, b: a * b))
        self.codebook_dim = len(self.levels)
        self.codebook_size = math.prod(self.levels)

        self.dim = default(dim, self.codebook_dim)
        self.channel_first = channel_first

        self.has_projections = self.dim != self.codebook_dim
        if self.has_projections:
            self.project_in = nnx.Linear(
                self.dim, self.codebook_dim, use_bias=projection_has_bias, rngs=rngs
            )
            self.project_out = nnx.Linear(
                self.codebook_dim, self.dim, use_bias=projection_has_bias, rngs=rngs
            )
        else:
            self.project_in = None
            self.project_out = None

        self.act_name = act_name
        self.act_func, self.inv_act_func = build_cdf_act(act_name)
        self.need_inv_act = need_inv_act
        self.quantize_rate = quantize_rate
        self.vector_norm = VectorNorm.build(vector_norm)
        # data-parallel: moment statistics psum over this mesh axis
        self.vector_norm.sync_axis = sync_axis
        self.sync_axis = sync_axis
        self.rngs = rngs

    def __repr__(self):
        return (
            f'FSP(levels={list(self.levels)}, codebook_size={self.codebook_size}, '
            f'codebook_dim={self.codebook_dim}, dim={self.dim}, '
            f"act_name='{self.act_name}', need_inv_act={self.need_inv_act}, "
            f'quantize_rate={self.quantize_rate})'
        )

    def _levels_arr(self, dtype=jnp.float32) -> jax.Array:
        return jnp.asarray(self.levels, dtype=dtype)

    # -- bin quantization ---------------------------------------------------------

    def quantize_act_value(self, act_z: jax.Array, eps: float):
        """[0,1] activations -> bin midpoints with STE (reference :276-281)."""
        levels = self._levels_arr(act_z.dtype)
        level_indices = jnp.floor(jnp.minimum(act_z, 1.0 - eps) * levels)
        q_act_z = (level_indices + 0.5) / levels
        q_act_z = act_z + sg(q_act_z - act_z)
        return q_act_z, sg(level_indices)

    # -- index codec ----------------------------------------------------------------

    def level_indices_to_indices(self, level_indices: jax.Array) -> jax.Array:
        basis = jnp.asarray(self.basis, level_indices.dtype)
        return (level_indices * basis).sum(axis=-1).astype(jnp.int32)

    def indices_to_level_indices(self, indices: jax.Array) -> jax.Array:
        indices = indices[..., None]
        return (indices // jnp.asarray(self.basis, jnp.int32)) % jnp.asarray(
            self.levels, jnp.int32
        )

    def indices_to_act_value(self, indices: jax.Array) -> jax.Array:
        level_indices = self.indices_to_level_indices(indices).astype(jnp.float32)
        return (level_indices + 0.5) / self._levels_arr()

    def indices_to_codes(self, indices: jax.Array, eps: float = 1e-6) -> jax.Array:
        q_act_z = self.indices_to_act_value(indices)
        if self.need_inv_act:
            q_z = self.inv_act_func(jnp.clip(q_act_z, eps, 1.0 - eps))
        else:
            q_z = (q_act_z - 0.5) / _UNIFORM_STD

        codes = self.project_out(q_z) if self.project_out is not None else q_z

        if self.channel_first:
            codes = jnp.moveaxis(codes, -1, 1)
        return codes

    # -- forward ------------------------------------------------------------------

    def __call__(
        self, z: jax.Array, eps: float | None = None
    ) -> tuple[jax.Array, jax.Array, jax.Array, dict]:
        eps = eps or float(jnp.finfo(z.dtype).eps)

        if self.channel_first:
            z = jnp.moveaxis(z, 1, -1)
        z_shape = z.shape
        assert z_shape[-1] == self.dim, (
            f'expected dimension of {self.dim} but found {z_shape[-1]}'
        )
        z = z.reshape(-1, self.dim)
        if self.project_in is not None:
            z = self.project_in(z)

        norm_loss, norm_info = self.vector_norm(z)

        act_z = self.act_func(z)
        q_act_z, level_indices = self.quantize_act_value(act_z, eps=eps)
        other_info = {}

        quantize_rate = self.quantize_rate if self.training else 1.0

        if quantize_rate < 1.0:
            key_p, key_m = jax.random.split(self.rngs.perturb())
            p_max_norm = 1.0 / (self._levels_arr(act_z.dtype) * 2)
            perturbations = p_max_norm * (
                jax.random.uniform(key_p, act_z.shape, dtype=act_z.dtype) * 2.0 - 1.0
            )
            proposal = act_z + perturbations
            accept_mask = (proposal > 0.0) & (proposal < 1.0)
            other_info['p_accept_prob'] = accept_mask.astype(jnp.float32).mean()
            p_act_z = jnp.where(accept_mask, proposal, act_z)

            p_mask = jax.random.uniform(key_m, q_act_z.shape) > quantize_rate
            q_act_z = jnp.where(p_mask, p_act_z, q_act_z)

        if self.need_inv_act:
            q_z = self.inv_act_func(jnp.clip(q_act_z, eps, 1.0 - eps))
            q_z = z + sg(q_z - z)
        else:
            q_z = (q_act_z - 0.5) / _UNIFORM_STD

        indices = self.level_indices_to_indices(level_indices)
        q_z = self.project_out(q_z) if self.project_out is not None else q_z

        level_indices = level_indices.reshape(z_shape[:-1] + (-1,))
        indices = indices.reshape(z_shape[:-1])
        q_z = q_z.reshape(z_shape)
        if self.channel_first:
            q_z = jnp.moveaxis(q_z, -1, 1)

        return q_z, indices, norm_loss, {
            'level_indices': level_indices,
            'norm_info': norm_info,
            **other_info,
        }
