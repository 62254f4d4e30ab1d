"""ResidualVQ / GroupedResidualVQ (components C6, C7).

TPU-native re-design of the reference ResidualVQ (residual_vq.py:166-630,
SoundStream algorithm 1): N-layer residual quantization with per-layer
codebook sizes, shared codebooks with deferred EMA, quantize-dropout, beam
search over code combinations, implicit neural codebooks (QINCo,
https://arxiv.org/abs/2401.14732), DiVeQ, and fractional inter-layer
gradient flow.

jit-native control flow:
  - quantize-dropout is a *masked contribution*: all layers execute, and
    layers past the sampled cutoff contribute zero (indices -1, losses 0,
    EMA weight 0). This replaces the reference's data-dependent python
    `continue` (residual_vq.py:473-476) with a static graph — the standard
    TPU trade (a bounded amount of wasted compute for one compiled program).
    The dropout index is drawn from the module's shared rng stream, so all
    data-parallel replicas agree without the reference's seed all_reduce
    (residual_vq.py:96-102).
  - beam search keeps static shapes: expand to (beams * topk), score,
    `lax.top_k`-prune back to beam_size each layer, and select the best beam
    by score after the loop (equivalent to the reference's prune-to-1 on the
    last layer, residual_vq.py:551-574).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.ste import frac_gradient, directional_reparam
from ..core.utils import cast_tuple, default, exists, first
from ..quantizers.vq import VectorQuantize

sg = jax.lax.stop_gradient


class _SiluBlock(nnx.Module):
    def __init__(self, dim: int, dim_hidden: int, *, rngs: nnx.Rngs):
        self.lin1 = nnx.Linear(dim, dim_hidden, rngs=rngs)
        self.lin2 = nnx.Linear(dim_hidden, dim, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.lin2(jax.nn.silu(self.lin1(x)))


class MLP(nnx.Module):
    """Implicit-neural-codebook MLP (QINCo; reference residual_vq.py:107-162).
    Maps (codes, condition) -> per-token transformed codes."""

    def __init__(
        self,
        dim: int,
        dim_hidden: int | None = None,
        depth: int = 4,
        l2norm_output: bool = False,
        *,
        rngs: nnx.Rngs,
    ):
        dim_hidden = default(dim_hidden, dim)
        self.proj_in = nnx.Linear(2 * dim, dim, rngs=rngs)
        self.layers = nnx.List([
            _SiluBlock(dim, dim_hidden, rngs=rngs) for _ in range(depth)
        ])
        self.l2norm_output = l2norm_output

    def __call__(self, codes: jax.Array, *, condition: jax.Array) -> jax.Array:
        """codes: (h, c, d) or (c, d); condition: (b, ..., d) ->
        (h, b, n, c, d) (or (b, n, c, d) for one-headed codes)."""
        one_headed = codes.ndim == 2
        if one_headed:
            codes = codes[None]

        cond = condition.reshape(condition.shape[0], -1, condition.shape[-1])
        h, num_codes = codes.shape[0], codes.shape[-2]
        b, n = cond.shape[:2]

        codes_b = jnp.broadcast_to(
            codes[:, None, None, :, :], (h, b, n, num_codes, codes.shape[-1])
        )
        cond_b = jnp.broadcast_to(
            cond[None, :, :, None, :], (h, b, n, num_codes, cond.shape[-1])
        )

        x = jnp.concatenate((cond_b, codes_b), axis=-1)
        x = self.proj_in(x)

        for block in self.layers:
            x = block(x) + x

        if self.l2norm_output:
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)

        if one_headed:
            return x[0]
        return x


def _batch_select(t: jax.Array, indices: jax.Array) -> jax.Array:
    """Select along the beam axis: t (..., j, *rest), indices (..., k) ->
    (..., k, *rest) (reference batch_select, residual_vq.py:74-89).

    Implemented as a one-hot contraction over the (tiny) candidate axis
    rather than take_along_axis: XLA's per-element gather lowering made the
    beam prune the dominant beam-search cost on TPU (~1 s per 8k-token
    forward at beam 4; the VQ layers themselves are ~1.4 ms each). The
    candidate axis is beam*topk (e.g. 16), so the onehot multiply-sum is
    cheap and lowers to vectorized selects/matmuls."""
    j = t.shape[indices.ndim - 1]
    onehot = jax.nn.one_hot(indices, j, dtype=t.dtype)       # (..., k, j)
    # (..., k, j) x (..., j, *rest) -> (..., k, *rest)
    t_flat = t.reshape(*t.shape[:indices.ndim - 1], j, -1)
    out = jnp.einsum(
        '... k j, ... j r -> ... k r', onehot, t_flat,
        preferred_element_type=t_flat.dtype,
    )
    return out.reshape(*indices.shape, *t.shape[indices.ndim:])


class ResidualVQ(ModeModule):
    def __init__(
        self,
        *,
        dim: int,
        num_quantizers: int | None = None,
        codebook_size: int | tuple[int, ...],
        codebook_dim: int | None = None,
        shared_codebook: bool = False,
        diveq: bool = False,
        heads: int = 1,
        quantize_dropout: bool = False,
        quantize_dropout_cutoff_index: int = 0,
        quantize_dropout_multiple_of: int = 1,
        accept_image_fmap: bool = False,
        implicit_neural_codebook: bool = False,
        mlp_kwargs: dict = {},
        beam_size: int | None = None,
        eval_beam_size: int | None = None,
        beam_score_quantizer_weights: list[float] | None = None,
        beam_score_precision='deterministic',
        quant_grad_frac: float = 0.0,
        rngs: nnx.Rngs | None = None,
        **vq_kwargs,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        assert heads == 1, 'residual vq is not compatible with multi-headed codes'
        assert exists(num_quantizers) or isinstance(codebook_size, tuple)

        codebook_dim = default(codebook_dim, dim)
        self.codebook_dim = codebook_dim

        requires_projection = codebook_dim != dim
        self.project_in = (
            nnx.Linear(dim, codebook_dim, rngs=rngs) if requires_projection else None
        )
        self.project_out = (
            nnx.Linear(codebook_dim, dim, rngs=rngs) if requires_projection else None
        )
        self.has_projections = requires_projection

        self.accept_image_fmap = accept_image_fmap

        self.implicit_neural_codebook = implicit_neural_codebook
        if implicit_neural_codebook:
            vq_kwargs.update(learnable_codebook=True, ema_update=False)

        if shared_codebook:
            vq_kwargs.update(
                manual_ema_update=True, manual_in_place_optimizer_update=True
            )

        # DiVeQ (figure 1, https://openreview.net/forum?id=KRVnpTbx7R)
        self.diveq = diveq
        if diveq:
            vq_kwargs.update(
                ema_update=False,
                learnable_codebook=True,
                route_gradients_to_input=False,
                commitment_weight=0.0,
            )

        codebook_sizes = cast_tuple(codebook_size, num_quantizers)
        num_quantizers = default(num_quantizers, len(codebook_sizes))
        assert len(codebook_sizes) == num_quantizers

        self.num_quantizers = num_quantizers
        self.codebook_sizes = codebook_sizes
        self.uniform_codebook_size = len(set(codebook_sizes)) == 1

        self.layers = nnx.List([
            VectorQuantize(
                dim=codebook_dim,
                codebook_size=layer_codebook_size,
                codebook_dim=codebook_dim,
                accept_image_fmap=accept_image_fmap,
                rngs=rngs,
                **vq_kwargs,
            )
            for layer_codebook_size in codebook_sizes
        ])
        assert all(not vq.has_projections for vq in self.layers)

        self.quantize_dropout = quantize_dropout and num_quantizers > 1
        assert quantize_dropout_cutoff_index >= 0
        self.quantize_dropout_cutoff_index = quantize_dropout_cutoff_index
        self.quantize_dropout_multiple_of = quantize_dropout_multiple_of

        self.vq_is_ema_updating = first(self.layers).ema_update
        assert not (self.vq_is_ema_updating and self.diveq)

        self.quant_grad_frac = quant_grad_frac if not diveq else 1.0

        assert not (exists(eval_beam_size) and not exists(beam_size))
        self.beam_size = beam_size
        self.eval_beam_size = default(eval_beam_size, beam_size)

        beam_score_quantizer_weights = default(
            beam_score_quantizer_weights, [1.0] * num_quantizers
        )
        assert len(beam_score_quantizer_weights) == num_quantizers
        self.beam_score_weights = tuple(float(w) for w in beam_score_quantizer_weights)
        # determinism knob (VERDICT r2 #4): HIGHEST forces the beam-score
        # distance matmuls f32-faithful so the on-chip beam ranking
        # reproduces the CPU/golden ordering (on TPU a plain-precision pass
        # is one bf16 matmul, which flips near-ties — ~95% index agreement
        # measured at the BASELINE beam shape). DEFAULT since round 4: the
        # measured cost is +3.1% of the beam forward (101.8 vs 98.7 ms at
        # q=8 c=1024 beam=4, 8k tokens, v5e — tools/tpu_r3_logs/
        # beam_cost.log); pass beam_score_precision=None to trade the
        # determinism back for that 3%.
        if beam_score_precision == 'deterministic':
            beam_score_precision = jax.lax.Precision.HIGHEST
        self.beam_score_precision = beam_score_precision

        # QINCo MLPs for layers 2..N
        if implicit_neural_codebook:
            self.mlps = nnx.List([
                MLP(
                    dim=codebook_dim,
                    l2norm_output=first(self.layers).use_cosine_sim,
                    rngs=rngs,
                    **mlp_kwargs,
                )
                for _ in range(num_quantizers - 1)
            ])
            layer_code_axis = getattr(first(self.layers), 'code_axis', None)
            if isinstance(layer_code_axis, str):
                # row-sharded codebooks: the replicated QINCo MLPs see only
                # their shard's rows in the forward, so their grads are
                # per-shard partials — declare them for the trainer's psum
                # (vqtpu.parallel.tp protocol)
                self.code_axis = layer_code_axis
                self._code_partial_grad_submodules = ('mlps',)
        else:
            self.mlps = None

        # sharing codebook: all layers reference the same Codebook module
        # (NNX preserves object aliasing through split/merge)
        self.shared_codebook = shared_codebook
        if shared_codebook:
            assert self.uniform_codebook_size
            shared = first(self.layers)._codebook
            for vq in self.layers[1:]:
                vq._codebook = shared
            shared_opt = first(self.layers).in_place_codebook_optimizer
            for vq in self.layers[1:]:
                vq.in_place_codebook_optimizer = shared_opt

        self.rngs = rngs

    # -- properties ---------------------------------------------------------------

    @property
    def codebook_size(self):
        return self.layers[0].codebook_size

    @property
    def codebooks(self):
        codebooks = [layer._codebook.embed[...][0] for layer in self.layers]
        if not self.uniform_codebook_size:
            return tuple(codebooks)
        return jnp.stack(codebooks)

    # -- decode ---------------------------------------------------------------------

    def get_codes_from_indices(self, indices: jax.Array) -> jax.Array:
        """(b, ..., q) indices -> (q, b, ..., d) codes; -1 entries (quantize
        dropout) decode to zero vectors (reference residual_vq.py:324-377)."""
        lead_shape = indices.shape[:-1]
        quantize_dim = indices.shape[-1]
        ind = indices.reshape(indices.shape[0], -1, quantize_dim)   # (b, n, q)

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

        # inside a mesh binding the layers' code_axis, each codebook leaf
        # holds its LOCAL rows and every gather goes through the psum'd
        # sharded lookup
        code_axis = getattr(self.layers[0], 'code_axis', None)
        code_parallel = (
            code_axis is not None
            and self.layers[0]._codebook._code_parallel()
        )

        # bf16 serving tier: the layers' eval forward quantizes to the
        # bf16-cast codebook rows, so decode must gather the SAME rounded
        # values (f32-represented, lossless) for the round-trip to be exact
        tier_bf16 = (
            getattr(self.layers[0], 'quantize_tier', 'exact') == 'bf16'
        )

        def _tier(cb):
            if tier_bf16:
                return cb.astype(jnp.bfloat16).astype(cb.dtype)
            return cb

        if not self.implicit_neural_codebook and self.uniform_codebook_size:
            stacked = _tier(self.codebooks)                       # (q, c, d)
            if code_parallel:
                from ..parallel.shard import sharded_gather_codes

                all_codes = jax.vmap(
                    lambda cb, i: sharded_gather_codes(cb, i, code_axis),
                    in_axes=(0, 2),
                )(stacked, ind)                                   # (q, b, n, d)
            else:
                all_codes = jax.vmap(
                    lambda cb, i: jnp.take(cb, i, axis=0), in_axes=(0, 2)
                )(stacked, ind)                                   # (q, b, n, d)
        else:
            mlps = (None, *(self.mlps or ())) if self.implicit_neural_codebook \
                else (None,) * self.num_quantizers
            codebooks = self.codebooks
            if isinstance(codebooks, jax.Array):
                codebooks = tuple(codebooks)

            if code_parallel:
                from ..parallel import collectives
                from ..parallel.shard import (
                    local_onehot_from_global, sharded_gather_codes,
                )

            all_codes = []
            quantized_out = 0.0
            for q, (codes, maybe_mlp) in enumerate(zip(codebooks, mlps)):
                layer_ind = ind[..., q]                           # (b, n)
                if maybe_mlp is not None:
                    transformed = maybe_mlp(codes, condition=quantized_out)
                    if code_parallel:
                        c_local = transformed.shape[-2]
                        row0 = jax.lax.axis_index(code_axis) * c_local
                        oh = local_onehot_from_global(
                            layer_ind, c_local, row0
                        )                                         # (b, n, c_l)
                        layer_codes = collectives.psum_exact(
                            jnp.einsum(
                                '... c, ... c d -> ... d', oh, transformed,
                                precision=jax.lax.Precision.HIGHEST,
                            ),
                            code_axis,
                        )
                    else:
                        layer_codes = jnp.take_along_axis(
                            transformed, layer_ind[..., None, None], axis=-2
                        )[..., 0, :]
                elif code_parallel:
                    layer_codes = sharded_gather_codes(
                        _tier(codes), layer_ind, code_axis
                    )
                else:
                    layer_codes = jnp.take(_tier(codes), layer_ind, axis=0)
                all_codes.append(layer_codes)
                quantized_out = quantized_out + layer_codes
            all_codes = jnp.stack(all_codes)                      # (q, b, n, d)

        all_codes = jnp.where(
            jnp.moveaxis(dropout_mask, -1, 0)[..., None], 0.0, all_codes
        )
        return all_codes.reshape(self.num_quantizers, *lead_shape, -1)

    def get_output_from_indices(self, indices: jax.Array) -> jax.Array:
        codes = self.get_codes_from_indices(indices)
        codes_summed = codes.sum(axis=0)
        if self.project_out is not None:
            codes_summed = self.project_out(codes_summed)
        return codes_summed

    # -- dropout index ------------------------------------------------------------

    def _draw_dropout_index(self) -> jax.Array:
        """Uniform layer index in [cutoff, Q), rounded up to the configured
        multiple; identical on all replicas via the shared rng stream."""
        key = self.rngs.dropout()
        low = self.quantize_dropout_cutoff_index
        idx = jax.random.randint(key, (), low, self.num_quantizers)
        mult = self.quantize_dropout_multiple_of
        if mult != 1:
            idx = jnp.ceil((idx + 1) / mult).astype(jnp.int32) * mult - 1
            idx = jnp.minimum(idx, self.num_quantizers - 1)
        return idx

    # -- forward ----------------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array | None = None,
        indices: jax.Array | None = None,
        return_all_codes: bool = False,
        sample_codebook_temp: float | None = None,
        freeze_codebook: bool = False,
        beam_size: int | None = None,
        rand_quantize_dropout_index: jax.Array | None = None,
    ):
        num_quant = self.num_quantizers
        return_loss = exists(indices)

        beam_size = default(
            beam_size, self.beam_size if self.training else self.eval_beam_size
        )
        is_beam_search = exists(beam_size) and beam_size > 1

        if self.project_in is not None:
            x = self.project_in(x)

        assert not (self.accept_image_fmap and exists(indices))

        if isinstance(indices, (list, tuple)):
            indices = jnp.stack(indices)

        should_quantize_dropout = (
            self.training and self.quantize_dropout and not return_loss
        )
        if should_quantize_dropout:
            dropout_index = default(
                rand_quantize_dropout_index, self._draw_dropout_index()
            )
        else:
            dropout_index = None

        if is_beam_search:
            return self._forward_beam(
                x, mask, beam_size, sample_codebook_temp, freeze_codebook,
                dropout_index, return_all_codes,
            )

        quantized_out = jnp.zeros_like(x)
        residual = x

        all_indices = []
        all_losses = []
        ce_losses = []
        layer_inputs = []          # candidate pool for shared-codebook expiry

        mlps = (None, *(self.mlps or ())) if self.implicit_neural_codebook \
            else (None,) * num_quant

        for quantizer_index, (vq, maybe_mlp) in enumerate(zip(self.layers, mlps)):
            keep = None
            if dropout_index is not None:
                keep = (quantizer_index <= dropout_index)        # traced bool

            layer_indices = None
            if return_loss:
                layer_indices = indices[..., quantizer_index]

            transform_fn = None
            if maybe_mlp is not None:
                transform_fn = partial(maybe_mlp, condition=quantized_out)

            ema_weight = None
            if keep is not None:
                ema_weight = keep.astype(jnp.float32)

            layer_inputs.append(residual)

            out = vq(
                residual,
                mask=mask,
                indices=layer_indices,
                sample_codebook_temp=sample_codebook_temp,
                freeze_codebook=freeze_codebook,
                codebook_transform_fn=transform_fn,
                ema_update_weight=ema_weight,
            )

            if return_loss:
                quantized, ce_loss = out
                ce_losses.append(ce_loss)
                residual = residual - frac_gradient(quantized, self.quant_grad_frac)
                quantized_out = quantized_out + quantized
                continue

            quantized, embed_indices, loss = out

            if keep is not None:
                quantized = jnp.where(keep, quantized, 0.0)
                embed_indices = jnp.where(keep, embed_indices, -1)
                loss = jnp.where(keep, loss, 0.0)

            residual = residual - frac_gradient(quantized, self.quant_grad_frac)
            quantized_out = quantized_out + quantized

            all_indices.append(embed_indices)
            all_losses.append(loss)

        # shared codebook: apply the deferred EMA / optimizer updates once
        if self.training and self.shared_codebook and not return_loss:
            shared_layer = first(self.layers)
            if self.vq_is_ema_updating:
                shared_layer._codebook.update_ema()
                shared_layer.update_in_place_optimizer()
            # expire once over the concatenation of every layer's residual
            # input (reference residual_vq.py:593-601)
            if self.accept_image_fmap:
                pool = jnp.concatenate(
                    [jnp.moveaxis(t, 1, -1).reshape(t.shape[0], -1, t.shape[1])
                     for t in layer_inputs], axis=1,
                )
            else:
                pool = jnp.concatenate(
                    [t.reshape(t.shape[0], -1, t.shape[-1]) for t in layer_inputs],
                    axis=1,
                )
            shared_layer._codebook.expire_codes_(
                shared_layer._codebook.transform_input(pool)[None]
                if pool.ndim < 4 else pool
            )

        if self.diveq:
            quantized_out = directional_reparam(
                self.rngs.diveq(), x, quantized_out
            )

        if self.project_out is not None:
            quantized_out = self.project_out(quantized_out)

        if return_loss:
            return quantized_out, sum(ce_losses)

        all_indices = jnp.stack(all_indices, axis=-1)
        all_losses = jnp.stack(all_losses, axis=-1)

        ret = (quantized_out, all_indices, all_losses)
        if not return_all_codes:
            return ret
        return (*ret, self.get_codes_from_indices(all_indices))

    # -- beam search ---------------------------------------------------------------

    def _forward_beam(
        self,
        x: jax.Array,
        mask: jax.Array | None,
        beam_size: int,
        sample_codebook_temp,
        freeze_codebook: bool,
        dropout_index,
        return_all_codes: bool,
    ):
        """Beam search over code combinations (reference
        residual_vq.py:447-589). Static shapes: beams expand to j*k then
        prune back to beam_size with lax.top_k."""
        num_quant = self.num_quantizers
        prec = x.shape[:-1]
        d = x.shape[-1]

        residual = x[..., None, :]                               # (..., 1, d)
        quantized_out = jnp.zeros_like(residual)
        search_scores = jnp.zeros((*prec, 1), x.dtype)
        all_indices = jnp.full((*prec, 1, 0), -1, jnp.int32)
        all_losses = jnp.zeros((*prec, 1, 0), jnp.float32)
        all_residuals = jnp.zeros((*prec, 1, 0, d), x.dtype)

        mlps = (None, *(self.mlps or ())) if self.implicit_neural_codebook \
            else (None,) * num_quant

        for quantizer_index, (vq, maybe_mlp) in enumerate(zip(self.layers, mlps)):
            keep = None
            if dropout_index is not None:
                keep = (quantizer_index <= dropout_index)

            transform_fn = None
            if maybe_mlp is not None:
                transform_fn = partial(maybe_mlp, condition=quantized_out)

            all_residuals = jnp.concatenate(
                (all_residuals, residual[..., None, :]), axis=-2
            )                                                    # (..., j, L+1, d)

            quantized, embed_indices, loss = vq(
                residual,
                mask=mask,
                sample_codebook_temp=sample_codebook_temp,
                freeze_codebook=freeze_codebook,
                codebook_transform_fn=transform_fn,
                topk=beam_size,
                dist_precision=self.beam_score_precision,
            )
            # quantized: (..., j, k, d); embed_indices/loss: (..., j, k)

            if keep is not None:
                quantized = jnp.where(keep, quantized, 0.0)
                embed_indices = jnp.where(keep, embed_indices, -1)
                loss = jnp.where(keep, loss, 0.0)

            w = self.beam_score_weights[quantizer_index]
            j = search_scores.shape[-1]
            k = beam_size

            expanded_scores = (
                search_scores[..., :, None] - loss * w
            ).reshape(*prec, j * k)

            residual_exp = (
                residual[..., :, None, :]
                - frac_gradient(quantized, self.quant_grad_frac)
            ).reshape(*prec, j * k, d)
            quantized_out_exp = (
                quantized_out[..., :, None, :] + quantized
            ).reshape(*prec, j * k, d)

            all_indices_exp = jnp.concatenate(
                (
                    jnp.repeat(all_indices[..., :, None, :], k, axis=-2),
                    embed_indices[..., None],
                ),
                axis=-1,
            ).reshape(*prec, j * k, -1)
            all_losses_exp = jnp.concatenate(
                (
                    jnp.repeat(all_losses[..., :, None, :], k, axis=-2),
                    loss[..., None].astype(jnp.float32),
                ),
                axis=-1,
            ).reshape(*prec, j * k, -1)
            all_residuals_exp = jnp.repeat(
                all_residuals[..., :, None, :, :], k, axis=-3
            ).reshape(*prec, j * k, quantizer_index + 1, d)

            if j * k > beam_size:
                search_scores, select = jax.lax.top_k(expanded_scores, beam_size)
                residual = _batch_select(residual_exp, select)
                quantized_out = _batch_select(quantized_out_exp, select)
                all_indices = _batch_select(all_indices_exp, select)
                all_losses = _batch_select(all_losses_exp, select)
                all_residuals = _batch_select(all_residuals_exp, select)
            else:
                search_scores = expanded_scores
                residual = residual_exp
                quantized_out = quantized_out_exp
                all_indices = all_indices_exp
                all_losses = all_losses_exp
                all_residuals = all_residuals_exp

        # final selection: best beam by score (== the reference's prune to
        # beam size 1 on the last executed layer)
        best = jnp.argmax(search_scores, axis=-1)                # (...,)
        quantized_out = _batch_select(quantized_out, best[..., None])[..., 0, :]
        all_indices = _batch_select(all_indices, best[..., None])[..., 0, :]
        all_losses = _batch_select(all_losses, best[..., None])[..., 0, :]
        all_residuals = _batch_select(all_residuals, best[..., None])[..., 0, :, :]

        # beam loss: mask-aware mean per layer (reference :576-582)
        if mask is not None:
            m = mask[..., None].astype(all_losses.dtype)
            all_losses = (all_losses * m).reshape(-1, num_quant).sum(axis=0) / \
                jnp.maximum(mask.sum(), 1e-4)
        else:
            all_losses = all_losses.reshape(-1, num_quant).mean(axis=0)

        # post-hoc EMA updates replaying each layer's saved residual input
        # (reference :584-589); dropped layers carry -1 indices which
        # update_indices masks out of the statistics
        if self.training:
            for q, vq in enumerate(self.layers):
                vq.update_indices(
                    all_residuals[..., q, :], all_indices[..., q], mask=mask
                )

        if self.training and self.shared_codebook:
            shared_layer = first(self.layers)
            if self.vq_is_ema_updating:
                shared_layer._codebook.update_ema()
                shared_layer.update_in_place_optimizer()
            shared_layer.expire_codes_(x)

        if self.diveq:
            quantized_out = directional_reparam(self.rngs.diveq(), x, quantized_out)

        if self.project_out is not None:
            quantized_out = self.project_out(quantized_out)

        ret = (quantized_out, all_indices, all_losses)
        if not return_all_codes:
            return ret
        return (*ret, self.get_codes_from_indices(all_indices))


class GroupedResidualVQ(ModeModule):
    """Feature-dim groups, one ResidualVQ each, with a shared dropout index
    (reference residual_vq.py:634-724)."""

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
            ResidualVQ(
                dim=dim_per_group,
                accept_image_fmap=accept_image_fmap,
                rngs=rngs,
                **kwargs,
            )
            for _ in range(groups)
        ])
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

    def __call__(
        self,
        x: jax.Array,
        indices=None,
        return_all_codes: bool = False,
        sample_codebook_temp: float | None = None,
        freeze_codebook: bool = False,
        mask: jax.Array | None = None,
    ):
        split_dim = self.split_dim
        assert x.shape[split_dim] == self.dim

        chunks = jnp.split(x, self.groups, axis=split_dim)

        indices = default(indices, ())
        return_ce_loss = len(indices) > 0
        assert len(indices) == 0 or len(indices) == self.groups

        # all groups drop out the same number of layers (reference :701)
        shared_dropout_index = None
        if self.training and first(self.rvqs).quantize_dropout and not return_ce_loss:
            shared_dropout_index = first(self.rvqs)._draw_dropout_index()

        forward_kwargs = dict(
            return_all_codes=return_all_codes,
            sample_codebook_temp=sample_codebook_temp,
            mask=mask,
            freeze_codebook=freeze_codebook,
            rand_quantize_dropout_index=shared_dropout_index,
        )

        out = []
        for g, (rvq, chunk) in enumerate(zip(self.rvqs, chunks)):
            chunk_indices = indices[g] if return_ce_loss else None
            out.append(rvq(chunk, indices=chunk_indices, **forward_kwargs))
        out = tuple(zip(*out))

        if return_ce_loss:
            quantized, ce_losses = out
            return jnp.concatenate(quantized, axis=split_dim), sum(ce_losses)

        quantized, all_indices, commit_losses, *maybe_all_codes = out
        quantized = jnp.concatenate(quantized, axis=split_dim)
        all_indices = jnp.stack(all_indices)
        commit_losses = jnp.stack(commit_losses)

        return (quantized, all_indices, commit_losses, *maybe_all_codes)
