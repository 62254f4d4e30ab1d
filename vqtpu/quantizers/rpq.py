"""RandomProjectionQuantizer (component C8).

BEST-RQ / USM (https://arxiv.org/abs/2202.01855). TPU-native re-design of
the reference (random_projection_quantizer.py:11-66): frozen xavier-normal
random projections per codebook head, a non-affine LayerNorm on the input,
and a permanently-frozen (eval-mode) cosine-similarity multi-head
VectorQuantize. Returns indices, or a CE loss against given indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from .vq import VectorQuantize


class RandomProjectionQuantizer(ModeModule):
    def __init__(
        self,
        *,
        dim: int,
        codebook_size: int,
        codebook_dim: int,
        num_codebooks: int = 1,
        norm: bool = True,
        rngs: nnx.Rngs | None = None,
        **kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        self.num_codebooks = num_codebooks

        # xavier-normal: std = sqrt(2 / (fan_in + fan_out))
        std = (2.0 / (dim + codebook_dim)) ** 0.5
        rand_projs = jax.random.normal(
            rngs.params(), (num_codebooks, dim, codebook_dim)
        ) * std
        self.rand_projs = nnx.Variable(rand_projs)          # frozen buffer

        # "The input data is normalized to have 0 mean and standard deviation
        # of 1 ... to prevent collapse" (section 3 of the paper)
        self.norm = (
            nnx.LayerNorm(dim, use_bias=False, use_scale=False, rngs=rngs)
            if norm else None
        )

        self.vq = VectorQuantize(
            dim=codebook_dim * num_codebooks,
            heads=num_codebooks,
            codebook_size=codebook_size,
            use_cosine_sim=True,
            separate_codebook_per_head=True,
            rngs=rngs,
            **kwargs,
        )
        self.vq.eval()

    def train(self, **attributes):
        super().train(**attributes)
        # the internal VQ stays frozen (the reference calls vq.eval() on
        # every forward, random_projection_quantizer.py:58)
        self.vq.eval()
        return self

    def __call__(self, x: jax.Array, indices: jax.Array | None = None):
        return_loss = indices is not None

        if self.norm is not None:
            x = self.norm(x)

        x = jnp.einsum(
            'bnd,hde->bnhe', x, self.rand_projs[...],
            preferred_element_type=jnp.float32,
        )
        x = x.reshape(*x.shape[:2], -1)

        out = self.vq(x, indices=indices)

        if return_loss:
            _, ce_loss = out
            return ce_loss

        _, indices, _ = out
        return indices
