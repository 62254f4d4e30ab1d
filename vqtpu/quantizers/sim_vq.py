"""SimVQ (component C15).

https://arxiv.org/abs/2411.02038. TPU-native re-design of the reference
SimVQ (sim_vq.py:37-138): a *frozen* gaussian codebook realized through a
learnable transform (linear by default); only the transform trains, which
sidesteps codebook collapse. Code selection uses the fused Pallas
distance+argmin kernel (the selection is under stop-gradient in the
reference, sim_vq.py:111-113, so the index-only fast path is exact).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.ste import rotate_to
from ..core.utils import default, identity
from ..kernels.distance import nearest_code, gather_codes
from ..parallel import collectives
from ..parallel.shard import sharded_gather_codes, sharded_nearest_code

sg = jax.lax.stop_gradient


class SimVQ(ModeModule):
    # the frozen codebook is (c, fd): row axis at position 2 from the end
    # (tensor-parallel sharding protocol, vqtpu.parallel.tp)
    _code_sharded_leaves = {'frozen_codebook': 2}
    # the transform's params are REPLICATED but each code shard only sees
    # its own rows' gradient contributions — the trainer must psum these
    # grads over the code axis (TensorParallelTrainer does; custom training
    # loops must do the same)
    _code_partial_grad_submodules = ('code_transform',)

    def __init__(
        self,
        dim: int,
        codebook_size: int,
        codebook_transform: nnx.Module | Callable | None = None,
        init_fn: Callable = identity,
        channel_first: bool = False,
        rotation_trick: bool = True,
        input_to_quantize_commit_loss_weight: float = 0.25,
        commitment_weight: float = 1.0,
        frozen_codebook_dim: int | None = None,
        use_pallas: bool = True,
        code_axis: str | None = None,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        self.codebook_size = codebook_size
        self.channel_first = channel_first

        frozen_codebook_dim = default(frozen_codebook_dim, dim)
        codebook = jax.random.normal(
            rngs.params(), (codebook_size, frozen_codebook_dim)
        ) * (frozen_codebook_dim ** -0.5)
        codebook = init_fn(codebook)

        # the codebook is implicit: a learnable transform of a frozen
        # gaussian (reference sim_vq.py:54-66)
        if codebook_transform is None:
            codebook_transform = nnx.Linear(
                frozen_codebook_dim, dim, use_bias=False, rngs=rngs
            )
        self.code_transform = codebook_transform

        self.frozen_codebook = nnx.Variable(codebook)       # persistent buffer

        self.rotation_trick = rotation_trick
        self.input_to_quantize_commit_loss_weight = input_to_quantize_commit_loss_weight
        self.commitment_weight = commitment_weight
        self.use_pallas = use_pallas

        # tensor-parallel rows: the frozen codebook shards over `code_axis`
        # inside a bound mesh (the learnable transform is row-wise — Linear
        # or any per-row callable — so the implicit codebook shards with it)
        self.code_axis = code_axis

    @property
    def codebook(self) -> jax.Array:
        return self.code_transform(self.frozen_codebook[...])

    @property
    def codebook_dim(self) -> int:
        return self.frozen_codebook[...].shape[-1]

    def _code_parallel(self) -> bool:
        return collectives.axis_is_bound(self.code_axis)

    def indices_to_codes(self, indices: jax.Array) -> jax.Array:
        if self._code_parallel():
            frozen_codes = sharded_gather_codes(
                self.frozen_codebook[...], indices, self.code_axis
            )
        else:
            frozen_codes = gather_codes(self.frozen_codebook[...], indices)
        quantized = self.code_transform(frozen_codes)
        if self.channel_first:
            quantized = jnp.moveaxis(quantized, -1, 1)
        return quantized

    def __call__(self, x: jax.Array):
        if self.channel_first:
            x = jnp.moveaxis(x, 1, -1)

        lead_shape = x.shape[:-1]
        d = x.shape[-1]
        x_flat = x.reshape(1, -1, d)

        implicit_codebook = self.codebook      # local rows when code-sharded

        # selection is under stop-gradient (reference :111-113): the fused
        # index-only kernel is exact here
        if self._code_parallel():
            indices = sharded_nearest_code(
                x_flat[0].astype(jnp.float32),
                sg(implicit_codebook).astype(jnp.float32),
                self.code_axis,
                'euclidean',
            )
            quantized = sharded_gather_codes(
                implicit_codebook, indices, self.code_axis
            )
        else:
            indices = nearest_code(
                x_flat[0].astype(jnp.float32),
                sg(implicit_codebook).astype(jnp.float32),
                'euclidean',
                force_xla=not self.use_pallas,
            )
            quantized = gather_codes(implicit_codebook, indices)
        x_tokens = x_flat[0]

        if self.training:
            # dual commit loss: codebook -> input (strong) and input ->
            # codebook (weighted down; reference :121-124)
            commit_loss = (
                ((sg(x_tokens) - quantized) ** 2).mean()
                + ((x_tokens - sg(quantized)) ** 2).mean()
                * self.input_to_quantize_commit_loss_weight
            )

            if self.rotation_trick:
                quantized = rotate_to(x_tokens, quantized)
            else:
                quantized = x_tokens + sg(quantized - x_tokens)
        else:
            # eval: the gradient estimators are value-identity rewrites
            # (rotate_to's forward value IS the quantized row by
            # construction), so skip their arithmetic — ~3.5x faster eval
            # forward at 524k tokens (benchmarks/composites_tpu.py) and the
            # output equals decode-from-indices bit-exactly
            commit_loss = jnp.asarray(0.0, jnp.float32)

        quantized = quantized.reshape(*lead_shape, d)
        indices = indices.reshape(lead_shape)

        if self.channel_first:
            quantized = jnp.moveaxis(quantized, -1, 1)

        return quantized, indices, commit_loss * self.commitment_weight
