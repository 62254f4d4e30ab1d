"""The EMA/learnable codebook engine (component C4).

TPU-native re-design of the reference `Codebook`
(vector_quantize_pytorch.py:349-791). The reference mutates registered
buffers mid-forward (and stashes pending EMA updates in `.grad`); here every
state transition is computed purely and assigned to flax NNX variables, so
the module is jit/shard_map-native while preserving the exact update ordering
(track stats -> ema -> expire, reference :619-641).

Cross-replica behavior: all statistics reductions are `psum` over
`sync_axis` (see vqtpu.parallel.collectives); dead-code replacement samples
candidates with a shared PRNG key, so codebooks stay bit-identical across
data-parallel replicas without any broadcast.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.utils import (
    default,
    l2norm,
    pack_tokens,
    uniform_init,
)
from ..core.sampling import gumbel_sample, masked_sample_vectors, masked_sample_indices
from ..core import utils as U
from ..kernels.distance import nearest_code, gather_codes, quantize_lookup
from ..kernels.train_fused import fused_train_quantize
from ..parallel import collectives
from ..parallel.shard import (
    local_onehot_from_global,
    sharded_gather_codes,
    sharded_nearest_code,
    sharded_quantize_lookup_bf16,
    slice_local_cols,
)
from .kmeans import kmeans
from ..core.module import ModeModule

sg = jax.lax.stop_gradient


def _vmap_h(fn):
    """vmap over the leading head dim, but RESHAPE when it is 1: a size-1
    batched matmul+argmax/gather lowers ~2x slower than the unbatched form
    on v5e (benchmarks/rvq_overhead_tpu.py bisect, round 4) — and h=1 is
    the overwhelmingly common case (every non-multihead quantizer)."""
    def run(*args):
        if all(a.shape[0] == 1 for a in args):
            out = fn(*(a[0] for a in args))
            return jax.tree.map(lambda o: o[None], out)
        return jax.vmap(fn)(*args)
    return run


def _expand_mask(mask: jax.Array, num_heads: int, num_tokens: int) -> jax.Array:
    """(b, n) -> (h, N) with N = b * inner * n, tiling over any head factor
    folded into the token axis (reference repeat 'b n -> c (b h n)',
    vector_quantize_pytorch.py:701)."""
    b, n = mask.shape
    inner = num_tokens // (b * n)
    m = jnp.broadcast_to(mask[:, None, :], (b, inner, n)).reshape(1, num_tokens)
    return jnp.broadcast_to(m, (num_heads, num_tokens))


def _prepare_ema_weight(weight, like: jax.Array):
    """Normalize an ema_update_weight to broadcast against `like`
    ((h, c) or (h, c, d)); accepts (c,) or (h, c) arrays or a scalar."""
    if weight is None:
        return 1.0
    weight = jnp.asarray(weight, dtype=jnp.float32)
    if weight.ndim == 0:
        return weight
    if weight.ndim == 1:
        weight = weight[None, :]
    assert weight.shape == like.shape[:2], (
        f'ema weight shape {weight.shape} must match (heads, codebook_size) '
        f'{like.shape[:2]}'
    )
    return U.append_dims_to(weight, like.ndim)


class Codebook(ModeModule):
    """Euclidean or cosine codebook with EMA statistics, kmeans init,
    affine re-parameterization and dead-code expiry."""

    # per-code state leaves -> position (from the end) of the code-row axis;
    # consumed by vqtpu.parallel.tp.codebook_pspecs when code_axis is set.
    # embed/embed_avg are (h, c, d); cluster_size is (h, c)
    _code_sharded_leaves = {
        'embed': 2,
        'embed_avg': 2,
        'accum_embed_avg': 2,
        'cluster_size': 1,
        'accum_cluster_size': 1,
    }

    def __init__(
        self,
        dim: int,
        codebook_size: int,
        *,
        num_codebooks: int = 1,
        kmeans_init: bool = False,
        kmeans_iters: int = 10,
        sync_kmeans: bool = True,
        decay: float = 0.8,
        eps: float = 1e-5,
        threshold_ema_dead_code: float = 2,
        reset_cluster_size: float | None = None,
        sync_axis: str | None = None,
        learnable_codebook: bool = False,
        gumbel_sample_fn: Callable = gumbel_sample,
        sample_codebook_temp: float = 1.0,
        ema_update: bool = True,
        manual_ema_update: bool = False,
        affine_param: bool = False,
        sync_affine_param: bool = False,
        affine_param_batch_decay: float = 0.99,
        affine_param_codebook_decay: float = 0.9,
        use_cosine_sim: bool = False,
        vq_bridge: nnx.Module | Callable | None = None,
        use_pallas: bool = True,
        stat_precision=jax.lax.Precision.HIGHEST,
        code_axis: str | None = None,
        quantize_tier: str = 'exact',
        train_fused: str = 'auto',
        rngs: nnx.Rngs,
    ):
        self.dim = dim
        self.codebook_size = codebook_size
        self.num_codebooks = num_codebooks
        self.decay = decay
        self.eps = eps
        self.ema_update = ema_update
        self.manual_ema_update = manual_ema_update
        self.kmeans_iters = kmeans_iters
        self.sync_kmeans = sync_kmeans
        self.use_cosine_sim = use_cosine_sim
        self.sample_codebook_temp = sample_codebook_temp
        self.gumbel_sample_fn = gumbel_sample_fn
        self.sync_axis = sync_axis
        self.learnable_codebook = learnable_codebook
        self.use_pallas = use_pallas

        # Tensor-parallel (row-sharded) codebook support. The module at rest
        # holds the FULL logical codebook (so construction, checkpointing and
        # out-of-mesh decode are unchanged); inside a shard_map that binds
        # `code_axis` with the codebook leaves sharded over it (see
        # vqtpu.parallel.tp), every method transparently operates on its
        # local rows with psum/all_gather collectives over the axis. This is
        # the north-star extension beyond the reference's replicate-
        # everything design (vector_quantize_pytorch.py:603-607).
        assert not (code_axis is not None and vq_bridge is not None), (
            'vq_bridge transforms the whole codebook jointly (attention '
            'across codes) and cannot run on row-sharded state'
        )
        self.code_axis = code_axis

        # serving/eval throughput tier (kernels.distance.quantize_lookup):
        # 'exact' = f32 selection + bit-exact lookup (default); 'bf16' =
        # eval-time selection and lookup on bfloat16-cast operands with f32
        # accumulation — EXACT w.r.t. the bf16 values, 2 MXU passes instead
        # of 4 (measured 1.9-2.8x at c<=512 on v5e, BASELINE.md). Training
        # forwards and EMA statistics always run the exact path. Composes
        # with code_axis: row-sharded eval forwards run the per-shard bf16
        # tier + winner reduction (parallel.shard.sharded_quantize_lookup_
        # bf16), bit-identical to the unsharded tier.
        assert quantize_tier in ('exact', 'bf16'), quantize_tier
        self.quantize_tier = quantize_tier
        # fused training step (kernels/train_fused.py): selection + bit-exact
        # lookup + EMA statistics in one VMEM pass per token block, so the
        # (n, c) one-hot never round-trips HBM and x is read once. 'on'
        # forces it wherever eligible (EMA training forward: no
        # distance-needing features, no vq_bridge/learnable/sharded
        # codebook; affine stats ride via an exact post-transform); 'off'
        # never; 'auto' defers to the on-silicon measured policy
        # (benchmarks/train_step_tpu.py — stays on the XLA composition
        # until the kernel beats it at the shape in question).
        assert train_fused in ('auto', 'on', 'off'), train_fused
        self.train_fused = train_fused
        # precision of the matmuls feeding persistent EMA state. HIGHEST is
        # bit-exact on TPU (one-hot operand; 3 bf16 passes) and the default;
        # DEFAULT trades ~25% training-forward time for bf16-rounded stats
        # (benchmarks/train_step_tpu.py)
        self.stat_precision = stat_precision
        self.training = True

        self.threshold_ema_dead_code = threshold_ema_dead_code
        self.has_dead_code_replacement = threshold_ema_dead_code > 0
        self.reset_cluster_size = default(reset_cluster_size, threshold_ema_dead_code)
        self.kmeans_init = kmeans_init

        self.rngs = rngs

        if kmeans_init:
            embed = jnp.zeros((num_codebooks, codebook_size, dim), jnp.float32)
        else:
            embed = uniform_init(rngs.params(), (num_codebooks, codebook_size, dim))
            if use_cosine_sim:
                embed = l2norm(embed)

        self.initted = nnx.Variable(jnp.asarray(not kmeans_init))
        self.cluster_size = nnx.Variable(
            jnp.ones((num_codebooks, codebook_size), jnp.float32)
        )
        self.embed_avg = nnx.Variable(embed.copy())

        if learnable_codebook:
            self.embed = nnx.Param(embed)
        else:
            self.embed = nnx.Variable(embed)

        # pending accumulated EMA statistics — the jit-safe equivalent of the
        # reference's `.grad` stash (vector_quantize_pytorch.py:70-97)
        self.accum_cluster_size = nnx.Variable(
            jnp.zeros((num_codebooks, codebook_size), jnp.float32)
        )
        self.accum_embed_avg = nnx.Variable(
            jnp.zeros((num_codebooks, codebook_size, dim), jnp.float32)
        )

        # fvq bridge (reference vector_quantize_pytorch.py:429,714-717)
        self.vq_bridge = vq_bridge

        # affine re-parameterization of batch/codebook statistics
        # (https://arxiv.org/abs/2203.01941; reference :433-448,492-542)
        self.affine_param = affine_param
        self.sync_affine_param = sync_affine_param
        self.affine_param_batch_decay = affine_param_batch_decay
        self.affine_param_codebook_decay = affine_param_codebook_decay

        if affine_param:
            stat_shape = (num_codebooks, 1, dim)
            self.batch_mean = nnx.Variable(jnp.zeros(stat_shape, jnp.float32))
            self.batch_variance = nnx.Variable(jnp.ones(stat_shape, jnp.float32))
            self.batch_mean_initted = nnx.Variable(jnp.asarray(False))
            self.batch_variance_initted = nnx.Variable(jnp.asarray(False))
            self.codebook_mean = nnx.Variable(jnp.zeros(stat_shape, jnp.float32))
            self.codebook_variance = nnx.Variable(jnp.ones(stat_shape, jnp.float32))
            self.codebook_mean_initted = nnx.Variable(jnp.asarray(False))
            self.codebook_variance_initted = nnx.Variable(jnp.asarray(False))

    # -- helpers ---------------------------------------------------------------

    def transform_input(self, x: jax.Array) -> jax.Array:
        return l2norm(x) if self.use_cosine_sim else x

    def _train_fused_active(self) -> bool:
        """Resolve the train_fused knob. 'auto' == the XLA composition,
        now a MEASURED dead-end decision (round 4, v5e): the fused kernel
        compiles only at block_n=512 (Mosaic's 16MB scoped-VMEM limit
        rejects >=1024) and measures 20.8 ms vs the XLA composition's
        11.4 ms at the BASELINE train shape (1M x 256, c=512) — Mosaic's
        small-matmul throughput plus the HIGHEST decomposition loses to
        XLA's fused scheduling, the same structural result as the r1
        fully-fused eval kernel (BASELINE.md dead-end table). 'on' remains
        a tested, bit-exact escape hatch (and the on-chip exactness gate
        in tools/verify_drive.py keeps it honest) but no measured envelope
        favors it."""
        if self.train_fused == 'on':
            return True
        return False

    def _embed_value(self) -> jax.Array:
        e = self.embed[...]
        return e if self.learnable_codebook else sg(e)

    # -- tensor-parallel (row-sharded) helpers ---------------------------------

    def _code_parallel(self) -> bool:
        """True iff this trace is inside a mesh region binding `code_axis`
        (the codebook leaves then hold the LOCAL row shard)."""
        return collectives.axis_is_bound(self.code_axis)

    def _code_row0(self) -> jax.Array:
        """Global row offset of this shard's first codebook row."""
        c_local = self.embed[...].shape[1]
        return jax.lax.axis_index(self.code_axis) * c_local

    # -- kmeans init -------------------------------------------------------------

    def init_embed_(self, flatten: jax.Array, mask: jax.Array | None = None):
        """First-batch kmeans init, as a `lax.cond` on the `initted` flag
        (reference vector_quantize_pytorch.py:450-473)."""
        key = self.rngs.kmeans()
        sync = self.sync_axis if self.sync_kmeans else None
        code_axis = self.code_axis if self._code_parallel() else None

        def do_init(_):
            embed, cluster_size = kmeans(
                key,
                flatten,
                self.codebook_size,
                num_iters=self.kmeans_iters,
                use_cosine_sim=self.use_cosine_sim,
                mask=mask,
                sync_axis=sync,
                code_axis=code_axis,
            )
            embed_sum = embed * cluster_size[..., None]
            new_embed = self._normalized_embed(embed_sum, cluster_size)
            return new_embed, embed_sum, cluster_size

        def no_init(_):
            return (
                self.embed[...].astype(jnp.float32),
                self.embed_avg[...],
                self.cluster_size[...],
            )

        embed, embed_avg, cluster_size = jax.lax.cond(
            self.initted[...], no_init, do_init, operand=None
        )
        self.embed[...] = embed
        self.embed_avg[...] = embed_avg
        self.cluster_size[...] = cluster_size
        self.initted[...] = jnp.asarray(True)

    # -- affine statistics ---------------------------------------------------

    def _update_with_decay(self, name: str, new_value: jax.Array, decay: float):
        var = getattr(self, name)
        flag = getattr(self, name + '_initted')
        new_value = sg(new_value)
        var[...] = jnp.where(
            flag[...], var[...] * decay + new_value * (1.0 - decay), new_value
        )
        flag[...] = jnp.asarray(True)

    def update_affine(
        self,
        flatten: jax.Array,
        embed: jax.Array,
        mask: jax.Array | None = None,
    ):
        """EMA-track codebook and batch mean/variance (reference
        vector_quantize_pytorch.py:492-542). Batch stats are optionally
        psum-synced across replicas (sync_affine_param)."""
        assert self.affine_param

        embed = embed.reshape(embed.shape[0], -1, embed.shape[-1])

        if self.training:
            if self._code_parallel():
                # per-dim moments over the GLOBAL rows: psum local partial
                # sums over the code axis, divide by the global count (the
                # affine stat state stays replicated across code shards)
                c_global = float(self.codebook_size)
                c_mean = collectives.psum(
                    embed.sum(axis=-2, keepdims=True), self.code_axis
                ) / c_global
                c_var = collectives.psum(
                    ((embed - c_mean) ** 2).sum(axis=-2, keepdims=True),
                    self.code_axis,
                ) / c_global
            else:
                c_mean = embed.mean(axis=-2, keepdims=True)
                c_var = embed.var(axis=-2, keepdims=True)
            self._update_with_decay('codebook_mean', c_mean, self.affine_param_codebook_decay)
            self._update_with_decay('codebook_variance', c_var, self.affine_param_codebook_decay)

        if mask is not None:
            w = mask.astype(jnp.float32)[..., None]               # (h, n, 1)
            count = w.sum(axis=-2, keepdims=True)
        else:
            w = jnp.ones(flatten.shape[:-1], jnp.float32)[..., None]
            count = jnp.full(
                (flatten.shape[0], 1, 1), flatten.shape[1], jnp.float32
            )

        sync = self.sync_axis if self.sync_affine_param else None
        count = collectives.psum(count, sync)
        batch_sum = collectives.psum((flatten * w).sum(axis=-2, keepdims=True), sync)
        batch_mean = batch_sum / jnp.maximum(count, 1.0)
        self._update_with_decay('batch_mean', batch_mean, self.affine_param_batch_decay)

        var_numer = collectives.psum(
            (((flatten - batch_mean) ** 2) * w).sum(axis=-2, keepdims=True), sync
        )
        batch_variance = var_numer / jnp.maximum(count, 1.0)
        self._update_with_decay('batch_variance', batch_variance, self.affine_param_batch_decay)

    def _affine_to_batch(self, embed: jax.Array) -> jax.Array:
        codebook_std = jnp.sqrt(jnp.maximum(self.codebook_variance[...], 1e-5))
        batch_std = jnp.sqrt(jnp.maximum(self.batch_variance[...], 1e-5))
        return (embed - self.codebook_mean[...]) * (
            batch_std / codebook_std
        ) + self.batch_mean[...]

    def _affine_to_codebook(self, flatten: jax.Array) -> jax.Array:
        codebook_std = jnp.sqrt(jnp.maximum(self.codebook_variance[...], 1e-5))
        batch_std = jnp.sqrt(jnp.maximum(self.batch_variance[...], 1e-5))
        return (flatten - self.batch_mean[...]) * (
            codebook_std / batch_std
        ) + self.codebook_mean[...]

    # -- EMA update machinery --------------------------------------------------

    def _normalized_embed(self, embed_avg: jax.Array, cluster_size: jax.Array) -> jax.Array:
        # inline laplace smoothing (core.utils.laplace_smoothing) so the
        # total cluster mass can be the GLOBAL one when the rows are sharded:
        # the denominator must match the unsharded engine exactly
        total = cluster_size.sum(axis=-1, keepdims=True)
        if self._code_parallel():
            total = collectives.psum(total, self.code_axis)
        smoothed = (
            (cluster_size + self.eps) / (total + self.codebook_size * self.eps)
        ) * total
        embed_normalized = embed_avg / smoothed[..., None]
        if self.use_cosine_sim:
            embed_normalized = l2norm(embed_normalized)
        return embed_normalized

    def update_ema(self):
        """embed <- laplace-smoothed embed_avg / cluster_size (reference
        vector_quantize_pytorch.py:576-584)."""
        self.embed[...] = sg(
            self._normalized_embed(self.embed_avg[...], self.cluster_size[...])
        )

    def _ema_inplace(self, name: str, accum_name: str, new: jax.Array, weight):
        """old <- lerp(old, new + pending_accum, (1 - decay) * weight); drains
        the accumulator (reference ema_inplace, vector_quantize_pytorch.py:76-97)."""
        var = getattr(self, name)
        accum = getattr(self, accum_name)
        new = new + accum[...]
        accum[...] = jnp.zeros_like(accum[...])
        old = var[...]
        var[...] = old + (new - old) * ((1.0 - self.decay) * weight)

    def track_cluster_size_and_embed_avg(
        self,
        flatten: jax.Array,
        embed_onehot: jax.Array,
        mask: jax.Array | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
    ):
        """Accumulate this batch's cluster sizes and embedding sums into the
        EMA statistics (reference vector_quantize_pytorch.py:586-617)."""
        flatten = sg(flatten.astype(jnp.float32))
        embed_onehot = sg(embed_onehot.astype(jnp.float32))

        if self.affine_param:
            flatten = self._affine_to_codebook(flatten)

        if mask is not None:
            embed_onehot = embed_onehot * mask[..., None].astype(jnp.float32)

        cluster_size = embed_onehot.sum(axis=1)                       # (h, c)

        # HIGHEST (default): on TPU the default precision lowers f32 matmuls
        # to one bf16 pass, which would round the x values accumulated into
        # the persistent EMA state (the one-hot side is exact in every pass,
        # so HIGHEST makes this a bit-exact masked sum — reference computes
        # it as an f32 einsum, vector_quantize_pytorch.py:605)
        embed_sum = jnp.einsum(
            'hnd,hnc->hcd', flatten, embed_onehot,
            preferred_element_type=jnp.float32,
            precision=self.stat_precision,
        )
        self._apply_batch_stats(
            cluster_size, embed_sum, ema_update_weight, accum_ema_update
        )

    def _apply_batch_stats(
        self,
        cluster_size: jax.Array,
        embed_sum: jax.Array,
        ema_update_weight=None,
        accum_ema_update: bool = False,
    ):
        """psum this batch's (h, c) counts / (h, c, d) sums over the data
        axis and fold them into the EMA state (or the manual accumulators).
        Shared tail of the XLA stat einsums above and the fused train kernel
        (kernels/train_fused.py), which computes the same stats in-VMEM."""
        cluster_size = collectives.psum(cluster_size, self.sync_axis)
        embed_sum = collectives.psum(embed_sum, self.sync_axis)

        if callable(ema_update_weight):
            ema_update_weight = ema_update_weight(embed_sum, cluster_size)

        if accum_ema_update:
            self.accum_cluster_size[...] = self.accum_cluster_size[...] + cluster_size
            self.accum_embed_avg[...] = self.accum_embed_avg[...] + embed_sum
            return

        w_cs = _prepare_ema_weight(ema_update_weight, self.cluster_size[...])
        w_ea = _prepare_ema_weight(ema_update_weight, self.embed_avg[...])
        self._ema_inplace('cluster_size', 'accum_cluster_size', cluster_size, w_cs)
        self._ema_inplace('embed_avg', 'accum_embed_avg', embed_sum, w_ea)

    # -- dead code expiry --------------------------------------------------------

    def replace(
        self,
        batch_samples: jax.Array,
        batch_mask: jax.Array,
        seq_mask: jax.Array | None = None,
    ):
        """Replace codes flagged in `batch_mask` (h, c) with random vectors
        sampled from the batch (reference vector_quantize_pytorch.py:544-562).
        Shape-static: candidates are drawn for every slot, then `where`-merged."""
        if self.use_cosine_sim:
            batch_samples = l2norm(batch_samples)
        batch_samples = sg(batch_samples.astype(jnp.float32))

        key = self.rngs.expire()
        h = batch_samples.shape[0]
        keys = jax.random.split(key, h)
        code_parallel = self._code_parallel()

        def per_head(k, samples, m):
            n = samples.shape[0]
            if code_parallel:
                # row-sharded codebook: draw the GLOBAL index vector with the
                # shared key (cheap — c ints), then take only this shard's
                # slot window, never materializing (c, d) candidates. Under
                # data parallelism each slot additionally picks a uniform
                # source replica (rank-select psum) — same distribution as
                # the unsharded pooled draw, O(c_local * d) per shard.
                c_local = self.embed[...].shape[1]
                row0 = jax.lax.axis_index(self.code_axis) * c_local
                idx = masked_sample_indices(k, n, m, self.codebook_size)
                my_idx = jax.lax.dynamic_slice_in_dim(idx, row0, c_local)
                cand = jnp.take(samples, my_idx, axis=0)
                if self.sync_axis is not None:
                    world = jax.lax.axis_size(self.sync_axis)
                    my_rank = jax.lax.axis_index(self.sync_axis)
                    src = jax.random.randint(
                        jax.random.fold_in(k, 1), (self.codebook_size,), 0, world
                    )
                    my_src = jax.lax.dynamic_slice_in_dim(src, row0, c_local)
                    cand = collectives.psum(
                        jnp.where((my_src == my_rank)[:, None], cand, 0.0),
                        self.sync_axis,
                    )
                return cand
            local = masked_sample_vectors(k, samples, m, self.codebook_size)
            pooled = collectives.all_gather(local, self.sync_axis)
            if self.sync_axis is not None:
                idx = jax.random.randint(k, (self.codebook_size,), 0, pooled.shape[0])
                return jnp.take(pooled, idx, axis=0)
            return pooled

        if seq_mask is not None:
            sampled = jax.vmap(per_head)(keys, batch_samples, seq_mask)
            has_valid = seq_mask.any(axis=-1)[:, None]             # (h, 1)
            if self.sync_axis is not None:
                # a head is skippable only if NO replica has a valid token —
                # otherwise data-parallel replicas would diverge on whether
                # they replaced the row
                has_valid = (
                    collectives.psum(has_valid.astype(jnp.float32), self.sync_axis)
                    > 0
                )
        else:
            sampled = jax.vmap(lambda k, s: per_head(k, s, None))(keys, batch_samples)
            has_valid = jnp.ones((h, 1), bool)

        # the reference skips replacement for heads with no valid samples
        replace_mask = batch_mask & has_valid                      # (h, c)

        self.embed[...] = jnp.where(
            replace_mask[..., None], sampled, self.embed[...]
        )
        self.cluster_size[...] = jnp.where(
            replace_mask, self.reset_cluster_size, self.cluster_size[...]
        )
        self.embed_avg[...] = jnp.where(
            replace_mask[..., None],
            sampled * self.reset_cluster_size,
            self.embed_avg[...],
        )

    def expire_codes_(self, batch_samples: jax.Array, seq_mask: jax.Array | None = None):
        if not self.has_dead_code_replacement or not self.training:
            return
        expired = self.cluster_size[...] < self.threshold_ema_dead_code
        batch_samples = batch_samples.reshape(
            batch_samples.shape[0], -1, batch_samples.shape[-1]
        )
        self.replace(batch_samples, batch_mask=expired, seq_mask=seq_mask)

    # -- codebook update orchestration -----------------------------------------

    def update_codebook(
        self,
        flatten: jax.Array,
        embed_onehot: jax.Array,
        mask: jax.Array | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
        ema_update: bool | None = None,
    ):
        """track -> ema -> expire, preserving the reference's ordering
        (vector_quantize_pytorch.py:619-641)."""
        ema_update = default(ema_update, self.ema_update)

        if not ema_update and not self.has_dead_code_replacement:
            return

        self.track_cluster_size_and_embed_avg(
            flatten, embed_onehot, mask, ema_update_weight, accum_ema_update
        )

        if accum_ema_update:
            return

        if ema_update and not self.manual_ema_update:
            self.update_ema()

        self.expire_codes_(flatten, seq_mask=mask)

    def update_codebook_from_stats(
        self,
        flatten: jax.Array,
        cluster_size: jax.Array,
        embed_sum: jax.Array,
        mask: jax.Array | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
        ema_update: bool | None = None,
    ):
        """update_codebook for pre-computed batch statistics (the fused
        train kernel returns bins/embed_sum alongside the lookup); same
        track -> ema -> expire ordering."""
        ema_update = default(ema_update, self.ema_update)

        if not ema_update and not self.has_dead_code_replacement:
            return

        self._apply_batch_stats(
            cluster_size, embed_sum, ema_update_weight, accum_ema_update
        )

        if accum_ema_update:
            return

        if ema_update and not self.manual_ema_update:
            self.update_ema()

        self.expire_codes_(flatten, seq_mask=mask)

    def update_indices(
        self,
        x: jax.Array,
        embed_ind: jax.Array,
        mask: jax.Array | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
        ema_update: bool | None = None,
    ):
        """Post-hoc EMA from externally chosen indices (used after beam
        search; reference vector_quantize_pytorch.py:643-668). Indices of -1
        are remapped to 0 and masked out of the statistics."""
        x = x.astype(jnp.float32)
        if x.ndim < 4:
            x = x[None, ...]
            embed_ind = embed_ind[None, ...]
        flatten, _ = pack_tokens(x)

        ind = embed_ind.reshape(x.shape[0], -1)

        dropped = ind == -1
        ind = jnp.where(dropped, 0, ind)
        if self._code_parallel():
            one_hot = local_onehot_from_global(
                ind, self.embed[...].shape[1], self._code_row0()
            )
        else:
            one_hot = jax.nn.one_hot(ind, self.codebook_size, dtype=jnp.float32)
        one_hot = jnp.where(dropped[..., None], 0.0, one_hot)

        if mask is not None:
            mask = _expand_mask(mask, flatten.shape[0], flatten.shape[1])

        self.update_codebook(
            flatten,
            one_hot,
            mask=mask,
            ema_update_weight=ema_update_weight,
            accum_ema_update=accum_ema_update,
            ema_update=ema_update,
        )

    # backwards-compatible alias, mirroring the reference
    update_ema_indices = update_indices

    # -- forward ----------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        *,
        sample_codebook_temp: float | None = None,
        mask: jax.Array | None = None,
        freeze_codebook: bool = False,
        codebook_transform_fn: Callable | None = None,
        ema_update_weight=None,
        accum_ema_update: bool = False,
        ema_update: bool | None = None,
        topk: int | None = None,
        update_usage: bool = True,
        need_distances: bool = True,
        stochastic: bool = False,
        straight_through_onehot: bool = False,
        dist_precision=None,
    ) -> tuple[jax.Array, jax.Array, jax.Array | None]:
        """Quantize (h?, b, n, d) tokens -> (quantize, indices, distances).

        The quantization core always runs in float32 (the reference forces
        this with an autocast guard, vector_quantize_pytorch.py:673).
        `need_distances=False` enables the fused Pallas argmin path which
        never materializes the (n, c) distance matrix; in that case the third
        return value is None.
        """
        ema_update = default(ema_update, self.ema_update)
        sample_codebook_temp = default(sample_codebook_temp, self.sample_codebook_temp)

        needs_codebook_dim = x.ndim < 4
        x = x.astype(jnp.float32)
        if needs_codebook_dim:
            x = x[None, ...]

        flatten, unpack = pack_tokens(x)                          # (h, N, d)
        h, num_tokens, _ = flatten.shape

        flat_mask = None
        if mask is not None:
            flat_mask = _expand_mask(mask, h, num_tokens)

        if self.kmeans_init:
            # traced as a lax.cond on the `initted` flag; a no-op after the
            # first training batch (and skipped entirely when the codebook
            # was constructed without kmeans_init, since initted starts True)
            self.init_embed_(flatten, mask=flat_mask)

        if self.affine_param:
            self.update_affine(flatten, self.embed[...], mask=flat_mask)

        embed = self._embed_value()

        if self.vq_bridge is not None:
            embed = self.vq_bridge(embed)

        if self.affine_param:
            embed = self._affine_to_batch(embed)

        # when the caller folds an extra leading dim into the head slot (e.g.
        # the beam-search path passes (b, n, k, d)), broadcast a single shared
        # codebook across it
        head_dim_is_fold = embed.shape[0] != h
        if head_dim_is_fold:
            assert embed.shape[0] == 1
            unbroadcast_embed = embed[0]                          # (c, d)
            embed = jnp.broadcast_to(embed, (h, *embed.shape[1:]))

        # --- distance + code selection ------------------------------------
        use_stochastic = (
            self.training and stochastic and sample_codebook_temp is not None
            and sample_codebook_temp > 0
        )
        fast_path = (
            not need_distances
            and not use_stochastic
            and not straight_through_onehot
            and topk is None
            and codebook_transform_fn is None
        )

        metric = 'cosine' if self.use_cosine_sim else 'euclidean'
        transformed_embed = None
        dist = None
        tier_quantize_flat = None
        fused_stats = None
        code_parallel = self._code_parallel()

        use_fused = (
            fast_path
            and self.training
            and update_usage
            and not freeze_codebook
            and not code_parallel
            and self.vq_bridge is None         # lookup must carry embed grads
            and not self.learnable_codebook
            and self.use_pallas                # the no-Pallas escape hatch
            # the kernel's stat matmuls are HIGHEST by construction; a user
            # who chose the faster bf16-rounded stats keeps the XLA path
            and self.stat_precision == jax.lax.Precision.HIGHEST
            and self._train_fused_active()
        )
        if use_fused:
            # one VMEM pass per token block: selection, bit-exact lookup and
            # the weighted EMA statistics (kernels/train_fused.py). Outputs
            # are stop_gradient'd — identical to the EMA path's semantics
            # (integer indices; detached codebook rows; stats feed Variables)
            interp = jax.default_backend() != 'tpu'
            w = None
            if flat_mask is not None:
                w = flat_mask.astype(jnp.float32)
            # sg on the INPUTS: the kernel has no JVP rule, and the EMA path
            # is non-differentiable by contract anyway (integer indices,
            # detached codebook rows, stats into Variables) — without this,
            # differentiating the surrounding loss w.r.t. encoder params
            # would hit the pallas_call with nonzero tangents and crash
            outs = [
                fused_train_quantize(
                    sg(flatten[i]), sg(embed[i]), metric,
                    None if w is None else sg(w[i]), interpret=interp,
                )
                for i in range(h)
            ]
            embed_ind_flat = jnp.stack([o[0] for o in outs])      # (h, N)
            tier_quantize_flat = sg(jnp.stack([o[1] for o in outs]))
            bins = sg(jnp.stack([o[2] for o in outs]))            # (h, c)
            esum = sg(jnp.stack([o[3] for o in outs]))            # (h, c, d)
            if self.affine_param:
                # the affine re-parameterization distributes exactly over
                # the weighted sums the kernel computed on RAW x:
                #   sum w·(x·s + t) = s·(sum w·x) + t·(sum w)
                # with s/t the per-dim batch->codebook map
                # (_affine_to_codebook); only f32 rounding differs from
                # transforming x before the contraction
                c_std = jnp.sqrt(jnp.maximum(self.codebook_variance[...], 1e-5))
                b_std = jnp.sqrt(jnp.maximum(self.batch_variance[...], 1e-5))
                s = sg(c_std / b_std)                             # (h, 1, d)
                t = sg(self.codebook_mean[...] - self.batch_mean[...] * s)
                esum = s * esum + bins[..., None] * t
            fused_stats = (bins, esum)
            embed_onehot = None
        elif fast_path and not self.training and self.quantize_tier == 'bf16':
            # eval/serving bf16 tier: fused selection + lookup on bf16-cast
            # operands (2 MXU passes; exact w.r.t. the bf16 values). Indices
            # may differ from the exact tier near f32-level ties — that is
            # the documented contract of the tier.
            if code_parallel:
                # per-shard bf16 tier + cross-shard winner reduction —
                # bit-identical to the unsharded tier (parallel.shard)
                embed_ind_flat, tier_quantize_flat = _vmap_h(
                    lambda xs, es: sharded_quantize_lookup_bf16(
                        xs, es, self.code_axis, metric
                    )
                )(flatten, embed)
            else:
                embed_ind_flat, tier_quantize_flat = _vmap_h(
                    lambda xs, es: quantize_lookup(xs, es, metric, tier='bf16')
                )(flatten, embed)
            embed_onehot = None
        elif fast_path:
            if code_parallel:
                # local fused selection + cross-shard (score, index) argmax
                # reduction over the code axis (parallel.shard)
                embed_ind_flat = _vmap_h(
                    lambda xs, es: sharded_nearest_code(
                        xs, es, self.code_axis, metric
                    )
                )(flatten, embed)                                 # (h, N)
            else:
                embed_ind_flat = nearest_code(
                    flatten, embed, metric, force_xla=not self.use_pallas
                )                                                 # (h, N)
            embed_onehot = None
        else:
            # row-sharded distance computations see only this shard's
            # columns, so the per-shard gradient contribution to the
            # (replicated) token tensor is partial — psum_in_bwd
            # re-assembles the full replicated gradient (ADVICE r2: the
            # all_gather'd dist feeding differentiable losses inflated and
            # de-replicated encoder gradients)
            flatten_d = (
                collectives.psum_in_bwd(flatten, self.code_axis)
                if code_parallel
                else flatten
            )
            if codebook_transform_fn is not None:
                # implicit neural codebook (QINCo): per-token transformed
                # codebook (reference vector_quantize_pytorch.py:729-738).
                # When the head slot is a folded batch/beam dim, the
                # transform must see the ONE-headed codebook — its condition
                # already carries the real batch, which aligns with the fold
                # (transformed (b, n*, c, d) ≡ (h, N, c, d) here); passing
                # the h-broadcast embed would double-count heads x batch.
                if head_dim_is_fold:
                    transformed = codebook_transform_fn(unbroadcast_embed)
                else:
                    transformed = codebook_transform_fn(embed)    # (h, b, n, c, d)
                transformed = transformed.reshape(
                    h, -1, *transformed.shape[-2:]
                )                                                 # (h, N, c, d)
                if self.use_cosine_sim:
                    transformed = l2norm(transformed)
                    dist = jnp.einsum(
                        'hnd,hncd->hnc', flatten_d, transformed,
                        preferred_element_type=jnp.float32,
                        precision=dist_precision,
                    )
                else:
                    diff = flatten_d[..., None, :] - transformed
                    dist = -jnp.sqrt(
                        jnp.maximum((diff ** 2).sum(axis=-1), 1e-12)
                    )
                # row-sharded: the per-token transformed codebook holds only
                # this shard's rows (a memory WIN for QINCo — the (N, c, d)
                # tensor shards with the codebook); distances gather below
                transformed_embed = transformed
            else:
                if self.use_cosine_sim:
                    dist = jnp.einsum(
                        'hnd,hcd->hnc', flatten_d, embed,
                        preferred_element_type=jnp.float32,
                        precision=dist_precision,
                    )
                else:
                    dist = -U.cdist(flatten_d, embed, precision=dist_precision)

            if code_parallel:
                # distance-materializing paths (stochastic sampling,
                # topk/beam, CE/diversity losses, QINCo) need the full
                # (N, c) row: gather the local column blocks over the code
                # axis (column order = shard order = global code order).
                # all_gather_exact: the gathered dist feeds losses computed
                # identically on every shard (replicated cotangent), so the
                # transpose must hand each shard its OWN column block
                # unscaled — the plain all_gather transpose (psum_scatter)
                # scales it by the axis size
                dist = collectives.all_gather_exact(
                    dist, self.code_axis, concat_axis=2
                )                                                 # (h, N, c)

            key = None
            if use_stochastic:
                key = self.rngs.sample()
            embed_ind_flat, embed_onehot = self.gumbel_sample_fn(
                key,
                dist,
                temperature=sample_codebook_temp,
                training=self.training,
                topk=topk,
            )

        if topk is not None:
            embed_ind = unpack(embed_ind_flat)                    # (h, b, n, k)
        else:
            embed_ind = unpack(embed_ind_flat)                    # (h, b, n)

        # --- gather / project quantized vectors ----------------------------
        if tier_quantize_flat is not None:
            quantize_flat = tier_quantize_flat
        elif transformed_embed is not None:
            if code_parallel:
                # per-token transformed codebook holds LOCAL rows: each
                # shard contributes its own columns, psum_exact reassembles
                c_local = transformed_embed.shape[-2]
                if self.training:
                    local_cols = slice_local_cols(
                        embed_onehot, c_local, self.code_axis
                    )
                else:
                    local_cols = local_onehot_from_global(
                        embed_ind_flat, c_local, self._code_row0()
                    )
                quantize_flat = collectives.psum_exact(
                    jnp.einsum(
                        'h n ... c, h n c d -> h n ... d',
                        local_cols, transformed_embed,
                        precision=jax.lax.Precision.HIGHEST,
                    ),
                    self.code_axis,
                )
            elif self.training:
                quantize_flat = jnp.einsum(
                    'h n ... c, h n c d -> h n ... d', embed_onehot, transformed_embed,
                    precision=jax.lax.Precision.HIGHEST,
                )
            else:
                # eval: select rows from the per-token transformed codebook
                # via a one-hot contraction (XLA's take_along_axis lowering
                # is per-element gather — the pathology behind the 23x beam
                # fix; the one-hot matmul at HIGHEST is bit-exact). Handles
                # the topk dim too (the reference's eval gather cannot).
                oh = jax.nn.one_hot(
                    embed_ind_flat, transformed_embed.shape[-2],
                    dtype=jnp.float32,
                )                                   # (h, N[, k], c)
                quantize_flat = jnp.einsum(
                    'h n ... c, h n c d -> h n ... d', oh, transformed_embed,
                    precision=jax.lax.Precision.HIGHEST,
                )
        elif self.training and embed_onehot is not None:
            if code_parallel:
                # each shard contributes its own columns; psum_exact (the
                # identity-transpose psum) re-assembles the differentiable
                # lookup without the axis-size gradient inflation
                c_local = embed.shape[1]
                local_cols = slice_local_cols(
                    embed_onehot, c_local, self.code_axis
                )
                quantize_flat = collectives.psum_exact(
                    jnp.einsum(
                        'h n ... c, h c d -> h n ... d', local_cols, embed,
                        precision=jax.lax.Precision.HIGHEST,
                    ),
                    self.code_axis,
                )
            else:
                quantize_flat = jnp.einsum(
                    'h n ... c, h c d -> h n ... d', embed_onehot, embed,
                    precision=jax.lax.Precision.HIGHEST,
                )
        else:
            # gather path: differentiable w.r.t. embed (scatter-add VJP)
            # one-hot-matmul lookup: bit-exact at HIGHEST precision and far
            # faster than XLA's gather lowering on TPU (kernels/distance.py)
            if code_parallel:
                quantize_flat = _vmap_h(
                    lambda e, i: sharded_gather_codes(e, i, self.code_axis)
                )(
                    embed, embed_ind_flat.reshape(h, -1)
                ).reshape(*embed_ind_flat.shape, embed.shape[-1])
            else:
                quantize_flat = _vmap_h(gather_codes)(
                    embed, embed_ind_flat.reshape(h, -1)
                ).reshape(*embed_ind_flat.shape, embed.shape[-1])

        quantize = unpack(quantize_flat)

        # --- EMA / usage updates -------------------------------------------
        if (
            self.training
            and update_usage
            and not freeze_codebook
            and topk is None
        ):
            if fused_stats is not None:
                # batch statistics already computed in-VMEM by the fused
                # kernel (mask weighting applied there)
                self.update_codebook_from_stats(
                    flatten,
                    *fused_stats,
                    mask=flat_mask,
                    ema_update_weight=ema_update_weight,
                    accum_ema_update=accum_ema_update,
                    ema_update=ema_update,
                )
            else:
                if code_parallel:
                    # the statistics are tracked on the LOCAL rows: a one-hot
                    # over this shard's column window (zero rows for codes
                    # owned by other shards); cluster_size/embed_avg shards
                    # then update independently, and only the laplace total
                    # crosses shards
                    embed_onehot = local_onehot_from_global(
                        embed_ind_flat, embed.shape[1], self._code_row0()
                    )
                elif embed_onehot is None:
                    embed_onehot = jax.nn.one_hot(
                        embed_ind_flat, self.codebook_size, dtype=jnp.float32
                    )
                self.update_codebook(
                    flatten,
                    embed_onehot,
                    mask=flat_mask,
                    ema_update_weight=ema_update_weight,
                    accum_ema_update=accum_ema_update,
                    ema_update=ema_update,
                )

        if needs_codebook_dim:
            quantize = quantize[0]
            embed_ind = embed_ind[0]

        if dist is not None:
            dist = unpack(dist)

        return quantize, embed_ind, dist
