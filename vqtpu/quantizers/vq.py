"""VectorQuantize — the feature-rich VQ layer (component C5).

TPU-native re-design of the reference `VectorQuantize`
(vector_quantize_pytorch.py:802-1403): projections, multi-head codes
(shared or per-head codebooks), channel-first / image / 3D feature-map
layouts, variable-length masking, EMA or learnable codebooks, in-place
codebook optimizer (an explicit inner `jax.grad` step instead of the
reference's loss.backward-inside-forward), commitment loss (MSE or
cross-entropy), codebook-diversity (entropy) loss, orthogonal regularization,
straight-through / rotation-trick / DiVeQ gradient estimators, sync_update_v,
top-k (beam) support, and a CE-loss-vs-given-indices mode.

Performance notes: the quantization core runs in float32; the common
training/eval paths (deterministic selection, MSE commitment) never
materialize the (n, c) distance matrix — code selection goes through the
fused Pallas kernel (vqtpu.kernels.distance). Paths that need distance
values (CE losses, diversity loss, stochastic/topk sampling, QINCo) fall
back to the XLA formulation.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import (
    at_most_one_of,
    default,
    exists,
    lens_to_mask,
    masked_mean,
    orthogonal_loss_fn,
    entropy as entropy_fn,
    append_dims_to,
)
from ..core.ste import straight_through, rotate_to, directional_reparam
from ..core.sampling import gumbel_sample
from ..codebook.codebook import Codebook
from ..kernels.distance import gather_codes
from ..parallel import collectives

sg = jax.lax.stop_gradient


class LossBreakdown(NamedTuple):
    commitment: jax.Array
    codebook_diversity: jax.Array
    orthogonal_reg: jax.Array
    inplace_optimize: jax.Array


def _cross_entropy_ignore_index(
    logits: jax.Array, targets: jax.Array, ignore_index: int = -1
) -> jax.Array:
    """Mean cross entropy over entries whose target != ignore_index.
    logits: (..., c) over the last axis; targets: (...).

    The target pick is a one-hot contraction, not take_along_axis: XLA's
    per-element gather lowering costs ~12 ms per 1M elements on TPU
    (BASELINE.md round-2 notes) while the multiply-sum fuses into the
    log_softmax."""
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe_targets, logits.shape[-1], dtype=logp.dtype)
    nll = -(logp * onehot).sum(axis=-1)
    return masked_mean(nll, valid)


class VectorQuantize(ModeModule):
    def __init__(
        self,
        dim: int,
        codebook_size: int,
        codebook_dim: int | None = None,
        heads: int = 1,
        separate_codebook_per_head: bool = False,
        decay: float = 0.8,
        eps: float = 1e-5,
        freeze_codebook: bool = False,
        kmeans_init: bool = False,
        kmeans_iters: int = 10,
        sync_kmeans: bool = True,
        use_cosine_sim: bool = False,
        layernorm_after_project_in: bool = False,
        threshold_ema_dead_code: float = 0,
        channel_last: bool = True,
        accept_image_fmap: bool = False,
        accept_3d_fmap: bool = False,
        commitment_weight: float = 1.0,
        commitment_use_cross_entropy_loss: bool = False,
        orthogonal_reg_weight: float = 0.0,
        orthogonal_reg_active_codes_only: bool = False,
        orthogonal_reg_max_codes: int | None = None,
        codebook_diversity_loss_weight: float = 0.0,
        codebook_diversity_temperature: float = 100.0,
        stochastic_sample_codes: bool = False,
        sample_codebook_temp: float = 1.0,
        approx_topk: bool = False,
        straight_through: bool = False,
        rotation_trick: bool | None = None,
        directional_reparam: bool = False,
        directional_reparam_variance: float = 5e-3,
        sync_axis: str | None = None,
        sync_codebook: bool | str | None = None,
        code_axis: str | None = None,
        sync_affine_param: bool = False,
        ema_update: bool | None = None,
        vq_bridge: nnx.Module | Callable | None = None,
        manual_ema_update: bool = False,
        learnable_codebook: bool | None = None,
        in_place_codebook_optimizer: optax.GradientTransformation | None = None,
        manual_in_place_optimizer_update: bool = False,
        affine_param: bool = False,
        affine_param_batch_decay: float = 0.99,
        affine_param_codebook_decay: float = 0.9,
        sync_update_v: float = 0.0,
        return_zeros_for_masked_padding: bool = True,
        route_gradients_to_input: bool = True,
        use_pallas: bool = True,
        stat_precision=jax.lax.Precision.HIGHEST,
        quantize_tier: str = 'exact',
        train_fused: str = 'auto',
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        # `sync_codebook` (reference vector_quantize_pytorch.py:835,925-926)
        # maps onto the mesh-axis model: a string names the data axis to psum
        # over; True selects the conventional 'data' axis; False/None defers
        # to `sync_axis` (None = unsynced, replicated-or-single-device).
        if isinstance(sync_codebook, str):
            sync_axis = sync_codebook
        elif sync_codebook:
            sync_axis = default(sync_axis, 'data')

        # interdependent defaults (reference vector_quantize_pytorch.py:852-856)
        ema_update = default(ema_update, not directional_reparam and vq_bridge is None)
        learnable_codebook = default(
            learnable_codebook, directional_reparam or vq_bridge is not None
        )
        rotation_trick = default(rotation_trick, not directional_reparam and dim > 1)

        self.dim = dim
        self.heads = heads
        self.separate_codebook_per_head = separate_codebook_per_head

        codebook_dim = default(codebook_dim, dim)
        codebook_input_dim = codebook_dim * heads
        requires_projection = codebook_input_dim != dim
        self.has_projections = requires_projection

        if requires_projection:
            self.project_in_linear = nnx.Linear(dim, codebook_input_dim, rngs=rngs)
            self.project_in_norm = (
                nnx.LayerNorm(codebook_input_dim, rngs=rngs)
                if layernorm_after_project_in
                else None
            )
            self.project_out_linear = nnx.Linear(codebook_input_dim, dim, rngs=rngs)
        else:
            self.project_in_linear = None
            self.project_in_norm = None
            self.project_out_linear = None

        self.eps = eps

        self.has_commitment_loss = commitment_weight > 0.0 and not directional_reparam
        self.commitment_weight = commitment_weight
        self.commitment_use_cross_entropy_loss = commitment_use_cross_entropy_loss

        assert not (use_cosine_sim and learnable_codebook), (
            'cosine sim distance codebook not compatible with learnable codebook yet'
        )
        self.learnable_codebook = learnable_codebook

        has_codebook_orthogonal_loss = orthogonal_reg_weight > 0.0
        self.has_codebook_orthogonal_loss = has_codebook_orthogonal_loss
        self.orthogonal_reg_weight = orthogonal_reg_weight
        self.orthogonal_reg_active_codes_only = orthogonal_reg_active_codes_only
        self.orthogonal_reg_max_codes = orthogonal_reg_max_codes

        has_codebook_diversity_loss = codebook_diversity_loss_weight > 0.0
        self.has_codebook_diversity_loss = has_codebook_diversity_loss
        self.codebook_diversity_temperature = codebook_diversity_temperature
        self.codebook_diversity_loss_weight = codebook_diversity_loss_weight

        assert at_most_one_of(straight_through, bool(rotation_trick), directional_reparam)
        self.rotation_trick = rotation_trick
        self.straight_through_gumbel = straight_through

        assert not (directional_reparam and threshold_ema_dead_code == 0), (
            'periodic dead code replacement should be enabled when directional '
            'reparam method is turned on'
        )
        self.directional_reparam = directional_reparam
        self.directional_reparam_variance = directional_reparam_variance

        self.route_gradients_to_input = route_gradients_to_input

        assert not (straight_through and learnable_codebook), (
            'gumbel straight through not allowed when learning the codebook'
        )
        assert not (ema_update and learnable_codebook), (
            'learnable codebook not compatible with EMA update'
        )
        assert not (vq_bridge is not None and not learnable_codebook)
        assert not (vq_bridge is not None and ema_update)

        assert 0 <= sync_update_v <= 1.0
        assert not (sync_update_v > 0.0 and not learnable_codebook), (
            'learnable codebook must be turned on'
        )
        self.sync_update_v = sync_update_v

        self.stochastic_sample_codes = stochastic_sample_codes
        self.sample_codebook_temp = sample_codebook_temp

        # approx_topk: TPU-native approx_max_k for the beam/topk path — the
        # exact lax.top_k is a full sort per row and dominates beam-search
        # cost at wide codebooks (~1s / 8k tokens at c=1024, beam 4)
        gumbel_sample_fn = partial(
            gumbel_sample,
            stochastic=stochastic_sample_codes,
            straight_through=straight_through,
            approx_topk=approx_topk,
        )

        if affine_param:
            assert not use_cosine_sim, (
                'affine param is only compatible with euclidean codebook'
            )

        self.sync_axis = sync_axis
        self.use_cosine_sim = use_cosine_sim

        # tensor-parallel codebook rows (see Codebook.code_axis).
        # Orthogonal regularization IS supported with row-sharded codebooks:
        # sum_ij (n_i . n_j)^2 == ||N^T N||_F^2, so the loss reduces to the
        # (d, d) gram — a psum of shard-local partials, never materializing
        # the c x c cosine matrix (see _orthogonal_reg_loss). The max_codes
        # memory-relief knob is unnecessary there (the gram is O(d^2)
        # regardless of c) and its random global row subset would require a
        # cross-shard gather, so it stays excluded.
        assert not (
            code_axis is not None
            and orthogonal_reg_weight > 0.0
            and orthogonal_reg_max_codes is not None
        ), (
            'orthogonal_reg_max_codes is not supported with row-sharded '
            '(code_axis) codebooks: the sharded loss runs through the (d, d) '
            'gram and needs no code subsampling'
        )
        self.code_axis = code_axis

        # eval/serving throughput tier: 'bf16' routes eval forwards and
        # index decode through the 2-MXU-pass bf16 pipeline
        # (kernels.distance.quantize_lookup tier='bf16') — ~2x measured eval
        # throughput at c<=512 on v5e, exact w.r.t. bf16-cast values
        # (BASELINE.md). Training always runs the exact path; composites
        # inherit the knob through their vq kwargs.
        self.quantize_tier = quantize_tier

        self._codebook = Codebook(
            dim=codebook_dim,
            num_codebooks=heads if separate_codebook_per_head else 1,
            codebook_size=codebook_size,
            kmeans_init=kmeans_init,
            kmeans_iters=kmeans_iters,
            sync_kmeans=sync_kmeans,
            decay=decay,
            eps=eps,
            threshold_ema_dead_code=threshold_ema_dead_code,
            sync_axis=sync_axis,
            learnable_codebook=has_codebook_orthogonal_loss or learnable_codebook,
            sample_codebook_temp=sample_codebook_temp,
            gumbel_sample_fn=gumbel_sample_fn,
            ema_update=ema_update,
            manual_ema_update=manual_ema_update,
            use_cosine_sim=use_cosine_sim,
            vq_bridge=vq_bridge,
            affine_param=affine_param,
            sync_affine_param=sync_affine_param,
            affine_param_batch_decay=affine_param_batch_decay,
            affine_param_codebook_decay=affine_param_codebook_decay,
            use_pallas=use_pallas,
            stat_precision=stat_precision,
            code_axis=code_axis,
            quantize_tier=quantize_tier,
            train_fused=train_fused,
            rngs=rngs,
        )

        # in-place codebook optimizer: an inner optax step on the codebook's
        # Params (replacing the reference's loss.backward-in-forward,
        # vector_quantize_pytorch.py:1186-1210)
        self.in_place_codebook_optimizer = (
            nnx.Optimizer(self._codebook, in_place_codebook_optimizer, wrt=nnx.Param)
            if in_place_codebook_optimizer is not None
            else None
        )
        self.manual_in_place_optimizer_update = manual_in_place_optimizer_update
        if in_place_codebook_optimizer is not None and manual_in_place_optimizer_update:
            _, params, _ = nnx.split(self._codebook, nnx.Param, ...)
            # store as a PURE dict inside the Variable: a Variable holding an
            # nnx.State gets absorbed by the graph machinery and reads back
            # as the State itself
            self._pending_inner_grads = nnx.Variable(
                jax.tree.map(jnp.zeros_like, nnx.to_pure_dict(params))
            )
        else:
            self._pending_inner_grads = None

        self.codebook_size = codebook_size

        self.accept_image_fmap = accept_image_fmap
        self.accept_3d_fmap = accept_3d_fmap
        self.channel_last = channel_last

        self.return_zeros_for_masked_padding = return_zeros_for_masked_padding
        self.freeze_codebook = freeze_codebook
        self.rngs = rngs

    # -- small helpers -------------------------------------------------------

    @property
    def ema_update(self):
        return self._codebook.ema_update

    @property
    def codebook(self) -> jax.Array:
        codebook = self._codebook.embed[...]
        if self.separate_codebook_per_head:
            return codebook
        return codebook[0]

    @codebook.setter
    def codebook(self, codes: jax.Array):
        if not self.separate_codebook_per_head:
            codes = codes[None, ...]
        self._codebook.embed[...] = codes

    def project_in(self, x: jax.Array) -> jax.Array:
        if self.project_in_linear is None:
            return x
        x = self.project_in_linear(x)
        if self.project_in_norm is not None:
            x = self.project_in_norm(x)
        return x

    def project_out(self, x: jax.Array) -> jax.Array:
        if self.project_out_linear is None:
            return x
        return self.project_out_linear(x)

    def maybe_split_heads_from_input(self, x: jax.Array) -> jax.Array:
        """(b, n, h*d) -> (h, b, n, d) for separate codebooks or
        (1, b*h, n, d) for a shared codebook (reference
        vector_quantize_pytorch.py:1044-1049)."""
        if self.heads == 1:
            return x
        b, n, _ = x.shape
        h = self.heads
        x = x.reshape(b, n, h, -1)
        if self.separate_codebook_per_head:
            return jnp.transpose(x, (2, 0, 1, 3))         # (h, b, n, d)
        x = jnp.transpose(x, (0, 2, 1, 3))                # (b, h, n, d)
        return x.reshape(1, b * h, n, -1)

    def _merge_heads(self, quantize: jax.Array, batch: int) -> jax.Array:
        h = self.heads
        if self.separate_codebook_per_head:
            # (h, b, n, d) -> (b, n, h*d)
            q = jnp.transpose(quantize, (1, 2, 0, 3))
            return q.reshape(*q.shape[:2], -1)
        # (1, b*h, n, d) -> (b, n, h*d)
        q = quantize[0].reshape(batch, h, *quantize.shape[2:])
        q = jnp.transpose(q, (0, 2, 1, 3))
        return q.reshape(*q.shape[:2], -1)

    def _reshape_indices_from_heads(self, embed_ind: jax.Array, batch: int) -> jax.Array:
        h = self.heads
        if self.separate_codebook_per_head:
            # (h, b, n, ...) -> (b, n, h) [extra dims ride along before h]
            return jnp.moveaxis(embed_ind, 0, -1)
        # (1, b*h, n, ...) -> (b, n, h)
        ind = embed_ind[0].reshape(batch, h, *embed_ind.shape[2:])
        return jnp.moveaxis(ind, 1, -1)

    # -- decode paths -----------------------------------------------------------

    def get_codes_from_indices(self, indices: jax.Array) -> jax.Array:
        """Indices -> codebook vectors (reference
        vector_quantize_pytorch.py:998-1018). Inside a mesh region binding
        `code_axis` the codebook leaf holds this shard's rows and the lookup
        goes through the psum'd sharded gather."""
        codebook = self.codebook
        if self.quantize_tier == 'bf16':
            # serving decode on the bf16 tier: the lookup runs 1 MXU pass
            # against the bf16-cast codebook (exact w.r.t. bf16 values)
            codebook = codebook.astype(jnp.bfloat16)
        is_multiheaded = codebook.ndim > 2

        if self._codebook._code_parallel():
            from ..parallel.shard import sharded_gather_codes

            gather = partial(sharded_gather_codes, code_axis=self.code_axis)
        else:
            gather = gather_codes

        if not is_multiheaded and self.heads > 1:
            # shared codebook across heads: indices (b, ..., h) gather to
            # (b, ..., h, d) and fold heads into the feature dim (the
            # reference leaves this case unhandled)
            codes = gather(codebook, indices)
            codes = codes.reshape(*codes.shape[:-2], -1)
        elif not is_multiheaded:
            codes = gather(codebook, indices)
        else:
            # indices: (b, ..., h)
            lead_shape = indices.shape[:-1]
            h = indices.shape[-1]
            ind = indices.reshape(indices.shape[0], -1, h)      # (b, n, h)
            ind = jnp.transpose(ind, (0, 2, 1))                 # (b, h, n)
            codes = jax.vmap(
                gather, in_axes=(0, 1), out_axes=1
            )(codebook, ind)                                    # (b, h, n, d)
            codes = jnp.transpose(codes, (0, 2, 1, 3))
            codes = codes.reshape(*lead_shape, -1)

        if not self.channel_last or self.accept_image_fmap or self.accept_3d_fmap:
            codes = jnp.moveaxis(codes, -1, 1)

        return codes

    def get_output_from_indices(self, indices: jax.Array) -> jax.Array:
        codes = self.get_codes_from_indices(indices)
        if not self.channel_last or self.accept_image_fmap or self.accept_3d_fmap:
            codes = jnp.moveaxis(codes, 1, -1)
            codes = self.project_out(codes)
            return jnp.moveaxis(codes, -1, 1)
        return self.project_out(codes)

    # -- external state updates ---------------------------------------------------

    def _normalize_input_layout(self, x: jax.Array) -> jax.Array:
        if self.accept_image_fmap:
            b, c, hh, ww = x.shape
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(b, hh * ww, c)
        if self.accept_3d_fmap:
            b, c, d, hh, ww = x.shape
            return jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, d * hh * ww, c)
        if not self.channel_last:
            return jnp.transpose(x, (0, 2, 1))
        return x

    def update_indices(
        self,
        x: jax.Array,
        indices: jax.Array,
        mask: jax.Array | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
        ema_update: bool | None = None,
    ):
        """Post-hoc EMA update from externally chosen indices (reference
        vector_quantize_pytorch.py:1056-1088)."""
        x = self._normalize_input_layout(x)
        if x.ndim == 2:
            x = x[:, None, :]
            indices = indices[:, None, ...] if indices.ndim >= 1 else indices

        x = self.project_in(x)
        x = self.maybe_split_heads_from_input(x)
        x = self._codebook.transform_input(x)

        if self.heads > 1:
            b = indices.shape[0]
            ind = jnp.moveaxis(indices, -1, 0) if self.separate_codebook_per_head else None
            if self.separate_codebook_per_head:
                indices = ind                                   # (h, b, n)
            else:
                ind = indices.reshape(b, -1, self.heads)
                ind = jnp.transpose(ind, (0, 2, 1)).reshape(1, -1, ind.shape[1])
                indices = ind                                   # (1, b*h, n)
        if self.accept_image_fmap:
            indices = indices.reshape(indices.shape[0], -1, *indices.shape[3:]) \
                if indices.ndim > 3 else indices.reshape(indices.shape[0], -1)
        if self.accept_3d_fmap:
            indices = indices.reshape(indices.shape[0], -1)

        self._codebook.update_indices(
            x, indices, mask=mask,
            ema_update_weight=ema_update_weight,
            accum_ema_update=accum_ema_update,
            ema_update=ema_update,
        )

    # alias for reference API compatibility
    update_ema_indices = update_indices

    def expire_codes_(self, x: jax.Array):
        x = self._codebook.transform_input(x)
        x = self.maybe_split_heads_from_input(x)
        self._codebook.expire_codes_(x)

    def update_in_place_optimizer(self):
        """Apply pending inner-optimizer grads (manual mode; reference
        vector_quantize_pytorch.py:1024-1042)."""
        if self.in_place_codebook_optimizer is None:
            return
        if self._pending_inner_grads is None:
            return
        pure = self._pending_inner_grads.get_value()
        pure = collectives.pmean(pure, self.sync_axis)
        grads = nnx.state(self._codebook, nnx.Param)
        nnx.replace_by_pure_dict(grads, pure)
        self.in_place_codebook_optimizer.update(self._codebook, grads)
        self._pending_inner_grads.set_value(
            jax.tree.map(jnp.zeros_like, pure))

    def _inner_codebook_step(self, x, mask, is_multiheaded, codebook_kwargs):
        """One explicit gradient step on the codebook params against
        MSE(quantize, stop_grad(x)), the functional equivalent of the
        reference's in-place optimizer double-forward
        (vector_quantize_pytorch.py:1186-1210)."""
        graphdef, params, rest = nnx.split(self._codebook, nnx.Param, ...)

        def loss_fn(p):
            # rebuild fresh Variable objects inside the grad trace so the
            # merged module may mutate its state without touching the
            # originals (mutations here are discarded by design)
            cb = nnx.merge(graphdef, p, jax.tree.map(lambda a: a, rest))
            q, _, _ = cb(x, **{**codebook_kwargs, 'update_usage': False})
            err = (q - sg(x)) ** 2
            if mask is not None:
                loss_mask = mask
                if is_multiheaded:
                    # mirror reference repeat 'b n -> c (b h) n'
                    c, bh, n = err.shape[0], err.shape[1], err.shape[2]
                    h = bh // mask.shape[0]
                    loss_mask = jnp.broadcast_to(
                        mask[None, :, None, :], (c, mask.shape[0], h, n)
                    ).reshape(c, bh, n)
                return masked_mean(err, loss_mask)
            return err.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)

        if self.manual_in_place_optimizer_update:
            self._pending_inner_grads.set_value(jax.tree.map(
                jnp.add, self._pending_inner_grads.get_value(),
                nnx.to_pure_dict(grads),
            ))
        else:
            grads = collectives.pmean(grads, self.sync_axis)
            self.in_place_codebook_optimizer.update(self._codebook, grads)

        return loss

    # -- losses --------------------------------------------------------------------

    def _calculate_ce_loss(self, distances: jax.Array, codes: jax.Array, batch: int):
        """CE between distance logits and given code indices (reference
        vector_quantize_pytorch.py:1242-1256). distances: (h, B, n, c)."""
        is_multiheaded = self.heads > 1
        if not is_multiheaded:
            logits = distances[0]                               # (b, n, c)
            targets = codes                                     # (b, n)
        elif self.separate_codebook_per_head:
            logits = jnp.transpose(distances, (1, 2, 0, 3))     # (b, n, h, c)
            targets = codes                                     # (b, n, h)
        else:
            h = self.heads
            d0 = distances[0].reshape(batch, h, *distances.shape[2:])
            logits = jnp.transpose(d0, (0, 2, 1, 3))            # (b, n, h, c)
            targets = codes                                     # (b, n, h)
        return _cross_entropy_ignore_index(logits, targets)

    def _orthogonal_reg_loss(self, embed_ind: jax.Array) -> jax.Array:
        codebook = self._codebook.embed[...]                    # (h, c, d)
        h, c, d = codebook.shape

        if self._codebook._code_parallel():
            return self._orthogonal_reg_loss_sharded(codebook, embed_ind)

        active_mask = None
        if self.orthogonal_reg_active_codes_only:
            assert not (self.heads > 1 and self.separate_codebook_per_head), (
                'orthogonal regularization for only active codes not compatible '
                'with multi-headed with separate codebooks yet'
            )
            active_mask = jnp.zeros((c,), bool).at[embed_ind.reshape(-1)].set(True)

        max_codes = self.orthogonal_reg_max_codes
        if max_codes is not None and c > max_codes:
            key = self.rngs.ortho()
            if active_mask is not None:
                # gumbel top-k draw biased to active codes; static shapes
                scores = jnp.where(active_mask, 0.0, -1e9) + jax.random.gumbel(key, (c,))
                _, ids = jax.lax.top_k(scores, max_codes)
                codebook = jnp.take(codebook, ids, axis=1)
                active_mask = jnp.take(active_mask, ids, axis=0)
            else:
                ids = jax.random.permutation(key, c)[:max_codes]
                codebook = jnp.take(codebook, ids, axis=1)

        if active_mask is None:
            return orthogonal_loss_fn(codebook)

        # masked variant of eq (2): restrict rows/cols to active codes while
        # keeping shapes static (replaces the reference's dynamic
        # codebook[:, unique_code_ids], vector_quantize_pytorch.py:1336-1339)
        from ..core.utils import l2norm
        normed = l2norm(codebook) * active_mask[None, :, None]
        cosine_sim = jnp.einsum(
            'hid,hjd->hij', normed, normed, preferred_element_type=jnp.float32
        )
        n_active = jnp.maximum(active_mask.sum().astype(jnp.float32), 1.0)
        h_dim = codebook.shape[0]
        return (cosine_sim ** 2).sum() / (h_dim * n_active ** 2) - (1.0 / n_active)

    def _orthogonal_reg_loss_sharded(
        self, codebook: jax.Array, embed_ind: jax.Array
    ) -> jax.Array:
        """Orthogonal regularization over a row-sharded codebook.

        Eq (2) of https://arxiv.org/abs/2112.00384 (reference
        vector_quantize_pytorch.py:1331-1348) needs sum_ij (n_i . n_j)^2 over
        the GLOBAL codebook. That sum is tr((N^T N)^2) = ||N^T N||_F^2, and
        the (d, d) gram N^T N is a plain sum over code rows — so each shard
        contributes its local partial gram and one psum over `code_axis`
        yields the global gram. O(h d^2) collective, no c x c matrix, no
        codebook all_gather. `psum_exact` (replicated-cotangent contract)
        routes the loss gradient back to each shard's own rows only.
        """
        from ..core.utils import l2norm

        axis = self.code_axis
        h, c_local, d = codebook.shape
        c_global = c_local * collectives.axis_size(axis)

        normed = l2norm(codebook)                               # (h, cl, d)

        if self.orthogonal_reg_active_codes_only:
            assert not (self.heads > 1 and self.separate_codebook_per_head), (
                'orthogonal regularization for only active codes not '
                'compatible with multi-headed with separate codebooks yet'
            )
            # embed_ind holds GLOBAL indices (replicated over code_axis):
            # every shard builds the same global mask and slices its rows
            global_mask = (
                jnp.zeros((c_global,), bool).at[embed_ind.reshape(-1)].set(True)
            )
            row0 = collectives.axis_index(axis) * c_local
            local_mask = jax.lax.dynamic_slice_in_dim(global_mask, row0, c_local)
            normed = normed * local_mask[None, :, None]
            n = jnp.maximum(global_mask.sum().astype(jnp.float32), 1.0)
        else:
            n = jnp.float32(c_global)

        gram_partial = jnp.einsum(
            'hcd,hce->hde', normed, normed,
            preferred_element_type=jnp.float32,
        )
        gram = collectives.psum_exact(gram_partial, axis)       # (h, d, d)
        return (gram ** 2).sum() / (h * n ** 2) - (1.0 / n)

    # -- forward --------------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        indices: jax.Array | None = None,
        mask: jax.Array | None = None,
        lens: jax.Array | None = None,
        topk: int | None = None,
        sample_codebook_temp: float | None = None,
        freeze_codebook: bool | None = None,
        return_loss_breakdown: bool = False,
        codebook_transform_fn: Callable | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
        ema_update: bool | None = None,
        dist_precision=None,
    ):
        orig_input = x
        orig_dtype = x.dtype

        freeze_codebook = default(freeze_codebook, self.freeze_codebook)

        assert not (exists(mask) and exists(lens))
        if exists(lens):
            mask = lens_to_mask(lens, x.shape[1])

        only_one = x.ndim == 2
        if only_one:
            assert not exists(mask)
            x = x[:, None, :]

        heads = self.heads
        is_multiheaded = heads > 1
        return_loss = exists(indices)
        batch = x.shape[0]

        # layout normalization
        if self.accept_image_fmap:
            assert not exists(mask)
            height, width = x.shape[-2:]
        if self.accept_3d_fmap:
            assert not exists(mask)
            depth, height, width = x.shape[-3:]
        x = self._normalize_input_layout(x)

        # project in + head split + maybe l2norm
        x = self.project_in(x)
        x = self.maybe_split_heads_from_input(x)
        x = self._codebook.transform_input(x)

        # does this call need the (n, c) distance matrix materialized?
        need_distances = (
            return_loss
            or topk is not None
            or codebook_transform_fn is not None
            or (self.training and self.has_codebook_diversity_loss)
            or (self.training and self.has_commitment_loss
                and self.commitment_use_cross_entropy_loss)
            or (self.training and self.stochastic_sample_codes)
            or (self.training and self.straight_through_gumbel)
        )

        codebook_kwargs = dict(
            sample_codebook_temp=sample_codebook_temp,
            mask=mask,
            freeze_codebook=freeze_codebook,
            codebook_transform_fn=codebook_transform_fn,
            ema_update_weight=ema_update_weight,
            accum_ema_update=accum_ema_update,
            ema_update=ema_update if ema_update is None else (ema_update and topk is None),
            topk=topk,
            need_distances=need_distances,
            stochastic=self.stochastic_sample_codes,
            straight_through_onehot=self.straight_through_gumbel,
            # TPU determinism knob: HIGHEST makes the (n, c) distance
            # matmuls f32-faithful so near-tie rankings (beam/topk) match
            # the CPU/golden ordering (default: one bf16 pass on TPU)
            dist_precision=dist_precision,
        )

        quantize, embed_ind, distances = self._codebook(x, **codebook_kwargs)

        commit_loss = orthogonal_reg_loss = inplace_optimize_loss = (
            codebook_diversity_loss
        ) = jnp.asarray(0.0, jnp.float32)

        # one inner optimization step on the codebook, then re-quantize
        should_inplace_optimize = self.in_place_codebook_optimizer is not None
        if should_inplace_optimize and self.training and not freeze_codebook:
            x32 = x.astype(jnp.float32)
            inplace_optimize_loss = self._inner_codebook_step(
                x32, mask, is_multiheaded, codebook_kwargs
            )
            quantize, embed_ind, distances = self._codebook(
                x, **{**codebook_kwargs, 'update_usage': False}
            )

        x32 = x.astype(jnp.float32)
        if self.training:
            maybe_detach = (
                sg if not self.learnable_codebook or freeze_codebook else (lambda t: t)
            )
            commit_quantize = maybe_detach(quantize)

            xq = x32
            if topk is not None:
                xq = jnp.broadcast_to(
                    x32[..., None, :], (*x32.shape[:-1], topk, x32.shape[-1])
                )

            if self.route_gradients_to_input:
                if self.rotation_trick:
                    quantize = rotate_to(xq, quantize)
                elif self.directional_reparam:
                    quantize = directional_reparam(
                        self.rngs.diveq(), xq, quantize,
                        self.directional_reparam_variance,
                    )
                else:
                    quantize = straight_through(xq, quantize)

            if self.sync_update_v > 0.0:
                # (21) in https://minyoungg.github.io/vqtorch/assets/draft_050523.pdf
                quantize = quantize + self.sync_update_v * (quantize - sg(quantize))

        # cross entropy on provided indices (reference :1260-1261)
        if return_loss:
            ce = self._calculate_ce_loss(distances, indices, batch)
            out = quantize
            out = self._finalize_quantize(
                out, batch, only_one,
                locals().get('height'), locals().get('width'), locals().get('depth'),
                orig_dtype,
            )
            return out, ce

        # reshape indices back to (b, n, [h])
        if is_multiheaded:
            embed_ind = self._reshape_indices_from_heads(embed_ind, batch)

        if self.accept_image_fmap:
            embed_ind = embed_ind.reshape(batch, height, width, *embed_ind.shape[2:])
        if self.accept_3d_fmap:
            embed_ind = embed_ind.reshape(
                batch, depth, height, width, *embed_ind.shape[2:]
            )
        if only_one:
            embed_ind = embed_ind[:, 0]

        loss = jnp.asarray(0.0, jnp.float32)

        if not self.training and topk is not None and self.has_commitment_loss:
            # per-candidate MSE so eval-time beam search can score beams
            # (the reference returns a scalar 0 here, which leaves its
            # eval-mode beam search without a working score signal)
            target = orig_input.astype(jnp.float32)
            rep_in = jnp.broadcast_to(target[..., None, :], quantize.shape)
            cand_loss = ((quantize.astype(jnp.float32) - rep_in) ** 2).mean(axis=-1)
            if exists(mask):
                cand_loss = jnp.where(
                    append_dims_to(mask, cand_loss.ndim), cand_loss, 0.0
                )
            loss = cand_loss * self.commitment_weight

        if self.training:
            if self.has_codebook_diversity_loss:
                prob = jax.nn.softmax(
                    distances * self.codebook_diversity_temperature, axis=-1
                )
                avg_prob = prob.reshape(-1, *prob.shape[-2:]).mean(axis=0)
                codebook_diversity_loss = -entropy_fn(avg_prob).mean()
                loss = loss + codebook_diversity_loss * self.codebook_diversity_loss_weight

            if self.has_commitment_loss:
                if self.commitment_use_cross_entropy_loss:
                    ce_indices = embed_ind
                    if exists(mask):
                        ce_mask = mask
                        if is_multiheaded:
                            ce_mask = mask[..., None]
                        ce_indices = jnp.where(ce_mask, ce_indices, -1)
                    commit_loss = self._calculate_ce_loss(distances, ce_indices, batch)
                else:
                    if topk is not None:
                        # per-candidate MSE against the *unprojected* input,
                        # reduced over d only (reference :1307-1315)
                        target = orig_input.astype(jnp.float32)
                        rep_in = jnp.broadcast_to(
                            target[..., None, :], commit_quantize.shape
                        )
                        commit_loss = ((commit_quantize - rep_in) ** 2).mean(axis=-1)
                        if exists(mask):
                            commit_loss = jnp.where(
                                append_dims_to(mask, commit_loss.ndim),
                                commit_loss, 0.0,
                            )
                    elif exists(mask):
                        # reference compares against the raw (unprojected)
                        # input here (:1319); fall back to the codebook-space
                        # input when a projection makes shapes incompatible
                        target = (
                            orig_input.astype(jnp.float32)
                            if commit_quantize.shape[-1] == orig_input.shape[-1]
                            and not self.heads > 1
                            else x32
                        )
                        err = (commit_quantize - target) ** 2
                        loss_mask = mask
                        if is_multiheaded:
                            c, bh, n = err.shape[0], err.shape[1], err.shape[2]
                            hh = bh // mask.shape[0]
                            loss_mask = jnp.broadcast_to(
                                mask[None, :, None, :], (c, mask.shape[0], hh, n)
                            ).reshape(c, bh, n)
                        commit_loss = masked_mean(err, loss_mask)
                    else:
                        commit_loss = ((commit_quantize - x32) ** 2).mean()

                loss = loss + commit_loss * self.commitment_weight

            if self.has_codebook_orthogonal_loss:
                orthogonal_reg_loss = self._orthogonal_reg_loss(embed_ind)
                loss = loss + orthogonal_reg_loss * self.orthogonal_reg_weight

        quantize = self._finalize_quantize(
            quantize, batch, only_one,
            locals().get('height'), locals().get('width'), locals().get('depth'),
            orig_dtype,
        )

        # masked positions: return zeros (or the original input) and -1 indices
        if exists(mask):
            if self.return_zeros_for_masked_padding:
                masked_out_value = jnp.zeros_like(orig_input)
            else:
                masked_out_value = orig_input

            if not self.channel_last and not self.accept_image_fmap \
                    and not self.accept_3d_fmap:
                # quantize was restored to (b, d, n): the token axis is last
                # (the reference crashes outright on channel_last=False +
                # mask, vector_quantize_pytorch.py:1319 — fixed here)
                qmask = mask[:, None, :]
            else:
                qmask = append_dims_to(mask, quantize.ndim)
            mval = masked_out_value
            if quantize.ndim > mval.ndim:                       # topk case
                mval = jnp.broadcast_to(mval[..., None, :], quantize.shape)
            quantize = jnp.where(qmask, quantize, mval.astype(quantize.dtype))

            imask = append_dims_to(mask, embed_ind.ndim)
            embed_ind = jnp.where(imask, embed_ind, -1)

        if not return_loss_breakdown:
            return quantize, embed_ind, loss

        breakdown = LossBreakdown(
            commit_loss, codebook_diversity_loss, orthogonal_reg_loss,
            inplace_optimize_loss,
        )
        return quantize, embed_ind, loss, breakdown

    def _finalize_quantize(
        self, quantize, batch, only_one, height, width, depth, orig_dtype
    ):
        """Merge heads, project out, restore layout and dtype."""
        if self.heads > 1:
            quantize = self._merge_heads(quantize, batch)
        elif quantize.ndim == 4:
            quantize = quantize[0]

        quantize = self.project_out(quantize)

        if not self.channel_last and not self.accept_image_fmap and not self.accept_3d_fmap:
            quantize = jnp.transpose(quantize, (0, 2, 1))
        if self.accept_image_fmap:
            quantize = quantize.reshape(batch, height, width, -1)
            quantize = jnp.transpose(quantize, (0, 3, 1, 2))
        if self.accept_3d_fmap:
            quantize = quantize.reshape(batch, depth, height, width, -1)
            quantize = jnp.transpose(quantize, (0, 4, 1, 2, 3))
        if only_one:
            quantize = quantize[:, 0, :]
        return quantize.astype(orig_dtype)
