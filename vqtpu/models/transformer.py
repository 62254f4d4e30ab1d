"""Minimal pre-norm transformer encoder, used as the FVQ `vq_bridge` over
the codebook (the reference's FVQ test/example pulls
x-transformers.ContinuousTransformerWrapper with memory tokens,
tests/test_readme.py:512-539; this is a self-contained NNX equivalent)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule


class EncoderBlock(ModeModule):
    def __init__(self, dim: int, heads: int = 4, ff_mult: int = 4, *, rngs: nnx.Rngs):
        self.norm1 = nnx.LayerNorm(dim, rngs=rngs)
        self.attn = nnx.MultiHeadAttention(
            num_heads=heads, in_features=dim, decode=False, rngs=rngs
        )
        self.norm2 = nnx.LayerNorm(dim, rngs=rngs)
        self.ff1 = nnx.Linear(dim, dim * ff_mult, rngs=rngs)
        self.ff2 = nnx.Linear(dim * ff_mult, dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.norm1(x)
        x = x + self.attn(h, h, h)
        h = self.norm2(x)
        x = x + self.ff2(jax.nn.gelu(self.ff1(h)))
        return x


class MiniEncoder(ModeModule):
    """Pre-norm encoder with learned memory tokens, suitable as a vq_bridge:
    maps a (h, c, d) codebook to a transformed (h, c, d) codebook."""

    def __init__(
        self,
        dim: int,
        depth: int = 1,
        heads: int = 4,
        num_memory_tokens: int = 2,
        input_dim: int | None = None,
        *,
        rngs: nnx.Rngs,
    ):
        """`input_dim` != dim adds bias-free in/out projections so the
        transformer can run at a wider inner width than the codebook dim —
        the configuration the reference's FVQ example found critical
        (examples/autoencoder_fvq.py:40-82: vq_dim 256 over input_dim 32)."""
        self.memory_tokens = nnx.Param(
            jax.random.normal(rngs.params(), (num_memory_tokens, dim)) * 0.02
        )
        self.blocks = nnx.List([
            EncoderBlock(dim, heads, rngs=rngs) for _ in range(depth)
        ])
        self.num_memory_tokens = num_memory_tokens
        if input_dim is not None and input_dim != dim:
            self.proj_in = nnx.Linear(input_dim, dim, use_bias=False, rngs=rngs)
            self.proj_out = nnx.Linear(dim, input_dim, use_bias=False, rngs=rngs)
        else:
            self.proj_in = None
            self.proj_out = None

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (..., n, d) -> (..., n, d)."""
        lead = x.shape[:-2]
        n, d_in = x.shape[-2:]
        x = x.reshape(-1, n, d_in)
        if self.proj_in is not None:
            x = self.proj_in(x)
        d = x.shape[-1]
        mem = jnp.broadcast_to(
            self.memory_tokens[...][None],
            (x.shape[0], self.num_memory_tokens, d),
        )
        x = jnp.concatenate((mem, x), axis=1)
        for block in self.blocks:
            x = block(x)
        x = x[:, self.num_memory_tokens:]
        if self.proj_out is not None:
            x = self.proj_out(x)
        return x.reshape(*lead, n, -1)
