"""Simple convolutional autoencoders for the example training scripts
(component C21; mirrors the model in reference examples/autoencoder.py:34-47,
re-built NHWC for TPU convolutions).

The quantizer operates on flattened (b, n, d) tokens between the encoder and
decoder — the TPU-native layout (channel-last, token axis shardable under
pjit) rather than the reference's NCHW feature maps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    """(b, h, w, c) 2x2 max pool, stride 2."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding='VALID',
    )


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """(b, h, w, c) nearest-neighbor 2x upsample."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvEncoder(ModeModule):
    """(b, h, w, in_ch) -> (b, h/4, w/4, dim)."""

    def __init__(self, dim: int = 32, in_channels: int = 1, *, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(in_channels, 16, (3, 3), padding='SAME', rngs=rngs)
        self.conv2 = nnx.Conv(16, dim, (3, 3), padding='SAME', rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = _max_pool_2x2(self.conv1(x))
        x = jax.nn.gelu(x)
        x = _max_pool_2x2(self.conv2(x))
        return x


class ConvDecoder(ModeModule):
    """(b, h/4, w/4, dim) -> (b, h, w, out_ch)."""

    def __init__(self, dim: int = 32, out_channels: int = 1, *, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(dim, 16, (3, 3), padding='SAME', rngs=rngs)
        self.conv2 = nnx.Conv(16, out_channels, (3, 3), padding='SAME', rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = _upsample_nearest_2x(x)
        x = jax.nn.gelu(self.conv1(x))
        x = _upsample_nearest_2x(x)
        return self.conv2(x)


class SimpleQuantizeAutoEncoder(ModeModule):
    """conv encoder -> quantizer (on flattened tokens) -> conv decoder.

    `quantizer_call` adapts quantizers with differing signatures/outputs;
    by default the quantizer is called as q(tokens, **kwargs) and its first
    output is the quantized tokens, with any extra outputs passed through —
    the same contract as the reference's utils.Sequential (utils.py:50-65).
    """

    def __init__(
        self,
        quantizer: nnx.Module,
        dim: int = 32,
        in_channels: int = 1,
        quantizer_call: Callable | None = None,
        *,
        rngs: nnx.Rngs,
    ):
        self.encoder = ConvEncoder(dim, in_channels, rngs=rngs)
        self.quantizer = quantizer
        self.decoder = ConvDecoder(dim, in_channels, rngs=rngs)
        self.quantizer_call = quantizer_call

    def __call__(self, x: jax.Array, **kwargs):
        z = self.encoder(x)                              # (b, h', w', d)
        b, h, w, d = z.shape
        tokens = z.reshape(b, h * w, d)

        if self.quantizer_call is not None:
            out = self.quantizer_call(self.quantizer, tokens, **kwargs)
        else:
            out = self.quantizer(tokens, **kwargs)

        quantized, *rest = out
        z = quantized.reshape(b, h, w, d)
        recon = self.decoder(z)
        return (recon, *rest)
