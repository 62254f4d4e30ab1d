"""Input layout normalization (layer L0).

Every quantizer operates on (batch, tokens, dim). The reference supports four
input layouts — channel-last sequences, channel-first sequences, 2D image
feature maps and 3D volume feature maps (reference
vector_quantize_pytorch.py:1131-1147, finite_scalar_quantization.py:256-263).
This module centralizes the (static-shape) reshapes so each quantizer
declares its layout once and gets matching restore functions for both
value-shaped (.., d) and index-shaped outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
import math

import jax


@dataclass(frozen=True)
class TokenLayout:
    """Records how an input was flattened to (b, n, d) so outputs can be
    restored. `spatial` holds the flattened middle dims (in channel-last
    order); `moved_channel` is True when dim was originally axis 1."""

    batch: int
    spatial: tuple[int, ...]
    dim: int
    moved_channel: bool

    @property
    def num_tokens(self) -> int:
        return math.prod(self.spatial) if self.spatial else 1

    def restore(self, t: jax.Array) -> jax.Array:
        """Restore a (b, n, *rest) value tensor to the original layout.
        Trailing feature dims (`rest`) ride along; if the channel was moved
        to last, the final feature axis moves back to axis 1."""
        out = t.reshape(self.batch, *self.spatial, *t.shape[2:])
        if self.moved_channel:
            out = jax.numpy.moveaxis(out, -1, 1)
        return out

    def restore_indices(self, t: jax.Array) -> jax.Array:
        """Restore (b, n, *extra) index tensors: spatial dims come back but
        the channel axis never applies to indices."""
        return t.reshape(self.batch, *self.spatial, *t.shape[2:])


def to_tokens(
    x: jax.Array,
    *,
    channel_first: bool = False,
    image_fmap: bool = False,
    fmap_3d: bool = False,
) -> tuple[jax.Array, TokenLayout]:
    """Normalize x to (b, n, d).

    - default: x is (b, n, d) (or (b, d) for a single token — callers handle
      that case separately, see VectorQuantize)
    - channel_first: x is (b, d, *spatial) — channel moves last, spatial dims
      flatten (covers the reference's `channel_last=False`, image fmap and 3d
      fmap paths uniformly)
    - image_fmap / fmap_3d are aliases that also assert rank
    """
    if image_fmap:
        assert x.ndim == 4, 'image fmap must be (b, c, h, w)'
        channel_first = True
    if fmap_3d:
        assert x.ndim == 5, '3d fmap must be (b, c, d, h, w)'
        channel_first = True

    if channel_first:
        x = jax.numpy.moveaxis(x, 1, -1)
        batch, *spatial, dim = x.shape
        layout = TokenLayout(batch, tuple(spatial), dim, moved_channel=True)
        return x.reshape(batch, layout.num_tokens, dim), layout

    assert x.ndim >= 3, 'channel-last input must be (b, ..., d)'
    batch, *spatial, dim = x.shape
    layout = TokenLayout(batch, tuple(spatial), dim, moved_channel=False)
    return x.reshape(batch, layout.num_tokens, dim), layout
