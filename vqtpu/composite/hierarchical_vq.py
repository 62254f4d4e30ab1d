"""HierarchicalVQ (component C18).

VAR-style multi-scale image quantization
(https://arxiv.org/abs/2404.02905). TPU-native re-design of the reference
(hierarchical_vq.py:28-170): pool the residual to each scale, quantize with
a shared VectorQuantize, upsample bilinearly and smooth with a 3x3-conv
residual mixer (Phi), accumulating the reconstruction coarse-to-fine.

Adaptive average pooling is expressed as two pooling *matmuls*
(P_h @ x @ P_w^T) built from static window boundaries — MXU-friendly and
bit-equivalent to adaptive_avg_pool2d, instead of a gather/scatter op.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import exists
from ..quantizers.vq import VectorQuantize


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic matrix implementing torch-style adaptive
    average pooling windows: [floor(i*n/s), ceil((i+1)*n/s))."""
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool_2d(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """(b, c, h, w) -> (b, c, oh, ow) via two pooling matmuls."""
    h, w = x.shape[-2:]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    ph = jnp.asarray(_adaptive_pool_matrix(h, oh))
    pw = jnp.asarray(_adaptive_pool_matrix(w, ow))
    x = jnp.einsum('oh,bchw->bcow', ph, x, preferred_element_type=jnp.float32)
    x = jnp.einsum('pw,bcow->bcop', pw, x, preferred_element_type=jnp.float32)
    return x.astype(dtype)


class _Phi2D(nnx.Module):
    """Residual 3x3-conv smoother (reference hierarchical_vq.py:16-25)."""

    def __init__(self, dim: int, resi_ratio: float, *, rngs: nnx.Rngs):
        self.resi_ratio = float(abs(resi_ratio))
        self.conv = nnx.Conv(dim, dim, kernel_size=(3, 3), padding='SAME', rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (b, c, h, w)."""
        if self.resi_ratio <= 1e-8:
            return x
        h = jnp.transpose(x, (0, 2, 3, 1))          # flax convs are NHWC
        h = self.conv(h)
        h = jnp.transpose(h, (0, 3, 1, 2))
        return (1.0 - self.resi_ratio) * x + self.resi_ratio * h


class HierarchicalVQ(ModeModule):
    def __init__(
        self,
        *,
        dim: int,
        codebook_size: int,
        scales: Sequence[int],
        decay: float = 0.99,
        commitment_weight: float = 1.0,
        rotation_trick: bool = False,
        kmeans_init: bool = True,
        kmeans_iters: int = 10,
        threshold_ema_dead_code: float = 2,
        stochastic_sample_codes: bool = False,
        sample_codebook_temp: float = 0.1,
        orthogonal_reg_weight: float = 0.0,
        orthogonal_reg_max_codes: int = 128,
        orthogonal_reg_active_codes_only: bool = False,
        quant_resi: float = 0.5,
        share_quant_resi: int = 1,
        accept_image_fmap: bool = False,
        rngs: nnx.Rngs | None = None,
        **vq_kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)
        assert accept_image_fmap, 'HierarchicalVQ currently expects accept_image_fmap = True'

        scales = [int(s) for s in scales]
        assert len(scales) > 0
        assert scales == sorted(scales)
        assert all(s > 0 for s in scales)

        self.dim = dim
        self.scales = tuple(scales)
        self.accept_image_fmap = True

        self.vq = VectorQuantize(
            dim=dim,
            codebook_size=codebook_size,
            decay=decay,
            commitment_weight=commitment_weight,
            rotation_trick=rotation_trick,
            kmeans_init=kmeans_init,
            kmeans_iters=kmeans_iters,
            threshold_ema_dead_code=threshold_ema_dead_code,
            stochastic_sample_codes=stochastic_sample_codes,
            sample_codebook_temp=sample_codebook_temp,
            orthogonal_reg_weight=orthogonal_reg_weight,
            orthogonal_reg_max_codes=orthogonal_reg_max_codes,
            orthogonal_reg_active_codes_only=orthogonal_reg_active_codes_only,
            accept_image_fmap=True,
            # extra VectorQuantize options (e.g. sync_axis for data-parallel
            # EMA stats, code_axis for row-sharded codebooks)
            **vq_kwargs,
            rngs=rngs,
        )

        # `share_quant_resi` smoothers are spread over the scale pyramid
        # (1 = one shared Phi; <=0 = one per scale). The scale->smoother
        # assignment is static, so it is resolved ONCE here into an index
        # table instead of being recomputed per forward call: each scale maps
        # to the nearest smoother along the normalized pyramid position.
        num_phi = (
            1 if share_quant_resi == 1
            else len(self.scales) if share_quant_resi <= 0
            else min(len(self.scales), int(share_quant_resi))
        )
        self.phi_levels = nnx.List([
            _Phi2D(dim, quant_resi, rngs=rngs) for _ in range(num_phi)
        ])
        span = max(len(self.scales) - 1, 1)
        self._phi_of_scale = tuple(
            min(num_phi - 1, round((num_phi - 1) * i / span))
            for i in range(len(self.scales))
        )

    def _choose_phi(self, scale_index: int):
        return self.phi_levels[self._phi_of_scale[scale_index]]

    def _upsample_to_full(self, q: jax.Array, full_hw: tuple[int, int], scale_index: int):
        if q.shape[-2:] != full_hw:
            # bilinear with half-pixel centers == F.interpolate(...,
            # align_corners=False)
            q = jax.image.resize(
                q, (*q.shape[:2], *full_hw), method='bilinear'
            )
        phi = self._choose_phi(scale_index)
        if exists(phi):
            q = phi(q)
        return q

    def __call__(
        self,
        x: jax.Array,
        indices=None,
        sample_codebook_temp: float | None = None,
        **kwargs,
    ):
        assert indices is None, (
            'reconstruction-from-indices path not implemented in forward'
        )
        del kwargs

        assert x.ndim == 4, 'expected image fmap of shape (batch, channels, height, width)'
        batch, dim, height, width = x.shape
        assert dim == self.dim

        residual = x
        reconstruction = jnp.zeros_like(x)
        all_indices = []
        all_commit_losses = []

        for scale_index, scale in enumerate(self.scales):
            residual_down = adaptive_avg_pool_2d(residual, (scale, scale))

            vq_kwargs = {}
            if exists(sample_codebook_temp):
                vq_kwargs['sample_codebook_temp'] = sample_codebook_temp

            quantized, scale_indices, commit_loss = self.vq(residual_down, **vq_kwargs)
            quantized = self._upsample_to_full(
                quantized, (height, width), scale_index
            )

            reconstruction = reconstruction + quantized
            residual = residual - quantized

            all_indices.append(scale_indices)
            all_commit_losses.append(commit_loss)

        mean_commit_loss = jnp.stack(all_commit_losses).mean()
        return reconstruction, tuple(all_indices), mean_commit_loss

    def get_output_from_indices(self, indices) -> jax.Array:
        assert isinstance(indices, (tuple, list))
        assert len(indices) == len(self.scales)

        full_hw = (self.scales[-1], self.scales[-1])

        reconstructed = None
        for scale_index, scale_indices in enumerate(indices):
            q = self.vq.get_output_from_indices(scale_indices)
            q = self._upsample_to_full(q, full_hw, scale_index)
            reconstructed = q if reconstructed is None else reconstructed + q
        return reconstructed
