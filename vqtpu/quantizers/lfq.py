"""LFQ — Lookup-Free (sign) Quantization (component C11).

https://arxiv.org/abs/2310.05737 (MagViT-v2). TPU-native re-design of the
reference LFQ (lookup_free_quantization.py:96-468): each dimension quantizes
to {-scale, +scale} by sign; an entropy auxiliary loss pushes per-sample
confidence down and batch codebook usage up. Supports the spherical/BSQ
variant (https://arxiv.org/abs/2406.07548), multi-codebook, per-layer
codebook_scale for residual stacking, soft input clamping, cosine-sim
projection, orthogonal rotation, and fractional per-sample-entropy
subsampling.

Cross-replica: the batch `avg_prob` is reduced with a *differentiable*
weighted psum over `sync_axis` — the native equivalent of the reference's
`torch.distributed.nn.all_reduce` (lookup_free_quantization.py:33-43,396).
Masked tokens are handled by weighting, never boolean indexing, so every
shape stays static under jit.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.layout import to_tokens
from ..core.utils import default, entropy as entropy_fn, l2norm
from ..parallel import collectives

sg = jax.lax.stop_gradient


class Return(NamedTuple):
    quantized: jax.Array
    indices: jax.Array
    entropy_aux_loss: jax.Array


class LossBreakdown(NamedTuple):
    per_sample_entropy: jax.Array
    batch_entropy: jax.Array
    commitment: jax.Array


class CosineSimLinear(nnx.Module):
    """Linear layer over l2-normalized input and weight columns
    (reference lookup_free_quantization.py:78-92)."""

    def __init__(self, dim_in: int, dim_out: int, scale: float = 1.0, *, rngs: nnx.Rngs):
        self.scale = scale
        self.weight = nnx.Param(jax.random.normal(rngs.params(), (dim_in, dim_out)))

    def __call__(self, x: jax.Array) -> jax.Array:
        x = l2norm(x)
        w = self.weight[...]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return (x @ w) * self.scale


class LFQ(ModeModule):
    def __init__(
        self,
        *,
        dim: int | None = None,
        codebook_size: int | None = None,
        entropy_loss_weight: float = 0.1,
        commitment_loss_weight: float = 0.0,
        diversity_gamma: float = 1.0,
        num_codebooks: int = 1,
        keep_num_codebooks_dim: bool | None = None,
        codebook_scale: float = 1.0,
        frac_per_sample_entropy: float = 1.0,
        has_projections: bool | None = None,
        projection_has_bias: bool = True,
        soft_clamp_input_value: float | None = None,
        cosine_sim_project_in: bool = False,
        cosine_sim_project_in_scale: float | None = None,
        channel_first: bool | None = None,
        straight_through_activation=None,
        experimental_softplus_entropy_loss: bool = False,
        entropy_loss_offset: float = 5.0,
        spherical: bool = False,
        force_quantization_f32: bool = True,
        orthogonal_rotation: bool = False,
        sync_axis: str | None = None,
        entropy_chunk_size: int | None = None,
        entropy_fused: str = 'auto',
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)

        assert dim is not None or codebook_size is not None, (
            'either dim or codebook_size must be specified for LFQ'
        )
        assert codebook_size is None or math.log2(codebook_size).is_integer(), (
            f'your codebook size must be a power of 2 for lookup free '
            f'quantization (suggested {2 ** math.ceil(math.log2(codebook_size))})'
        )

        if codebook_size is None:
            codebook_size = 2 ** dim
        self.codebook_size = codebook_size

        codebook_dim = int(math.log2(codebook_size))
        codebook_dims = codebook_dim * num_codebooks
        dim = default(dim, codebook_dims)

        has_projections = default(has_projections, dim != codebook_dims)

        if has_projections:
            if cosine_sim_project_in:
                scale = default(cosine_sim_project_in_scale, codebook_scale)
                self.project_in = CosineSimLinear(dim, codebook_dims, scale=scale, rngs=rngs)
            else:
                self.project_in = nnx.Linear(
                    dim, codebook_dims, use_bias=projection_has_bias, rngs=rngs
                )
            self.project_out = nnx.Linear(
                codebook_dims, dim, use_bias=projection_has_bias, rngs=rngs
            )
        else:
            self.project_in = None
            self.project_out = None
        self.has_projections = has_projections

        self.dim = dim
        self.codebook_dim = codebook_dim
        self.num_codebooks = num_codebooks

        keep_num_codebooks_dim = default(keep_num_codebooks_dim, num_codebooks > 1)
        assert not (num_codebooks > 1 and not keep_num_codebooks_dim)
        self.keep_num_codebooks_dim = keep_num_codebooks_dim

        self.channel_first = channel_first

        self.spherical = spherical

        self.orthogonal_rotation = orthogonal_rotation
        if orthogonal_rotation:
            rot = jax.random.orthogonal(rngs.params(), codebook_dim)
            self.orthogonal_rot = nnx.Variable(rot.astype(jnp.float32))

        assert 0 < frac_per_sample_entropy <= 1.0
        self.frac_per_sample_entropy = frac_per_sample_entropy

        self.diversity_gamma = diversity_gamma
        self.entropy_loss_weight = entropy_loss_weight
        self.codebook_scale = codebook_scale
        self.commitment_loss_weight = commitment_loss_weight

        self.soft_clamp_input_value = soft_clamp_input_value
        assert soft_clamp_input_value is None or soft_clamp_input_value >= codebook_scale

        self.entropy_loss_offset = entropy_loss_offset
        self.straight_through_activation = default(
            straight_through_activation, lambda t: t
        )
        self.experimental_softplus_entropy_loss = experimental_softplus_entropy_loss

        self.force_quantization_f32 = force_quantization_f32
        self.sync_axis = sync_axis

        # the entropy terms materialize a (tokens, num_codebooks, K)
        # probability tensor; beyond K ~ 2^16 that dominates memory
        # (reference has the same structure, lookup_free_quantization.py:
        # 345-403, and only offers token subsampling). The chunked path
        # streams the implicit codebook in K-chunks (streaming logsumexp +
        # a second accumulation pass) so 2^18-2^20 codebooks fit; None =
        # auto (chunk iff K > 2^16). Must be a power of two <= K.
        if entropy_chunk_size is not None:
            assert (
                math.log2(entropy_chunk_size).is_integer()
                and entropy_chunk_size <= codebook_size
            ), entropy_chunk_size
        self.entropy_chunk_size = entropy_chunk_size

        # Fused Pallas entropy sweeps (kernels/lfq_entropy.py): the chunked
        # statistics computed without ever materializing the (N, K) logit
        # stream in HBM — measured 1.9x fwd / 1.5x fwd+bwd over the XLA
        # chunked path at K=2^18 on v5e. 'auto' routes to it on TPU for
        # single-codebook chunked-regime sizes; 'on'/'off' force.
        assert entropy_fused in ('auto', 'on', 'off'), entropy_fused
        self.entropy_fused = entropy_fused
        self.rngs = rngs

    # -- bit codec (derived constants, never stored) ---------------------------

    def _bit_mask(self) -> jax.Array:
        """Powers of two, MSB first (reference :206)."""
        return 2 ** jnp.arange(self.codebook_dim - 1, -1, -1)

    def bits_to_codes(self, bits: jax.Array) -> jax.Array:
        return bits * self.codebook_scale * 2 - self.codebook_scale

    def maybe_l2norm(self, t: jax.Array) -> jax.Array:
        if not self.spherical:
            return t
        return l2norm(t) * self.codebook_scale

    @property
    def codebook(self) -> jax.Array:
        """All 2^d sign patterns as code vectors (reference :215-219);
        derived arithmetically, recomputed on demand."""
        all_codes = jnp.arange(self.codebook_size)
        bits = ((all_codes[..., None] & self._bit_mask()) != 0).astype(jnp.float32)
        return self.bits_to_codes(bits)

    @property
    def dtype(self):
        return jnp.float32

    def indices_to_codes(self, indices: jax.Array, project_out: bool = True) -> jax.Array:
        """Arithmetic decode (reference :228-263)."""
        is_img_or_video = indices.ndim >= (3 + int(self.keep_num_codebooks_dim))
        should_transpose = default(self.channel_first, is_img_or_video)

        if not self.keep_num_codebooks_dim:
            indices = indices[..., None]

        bits = ((indices[..., None] & self._bit_mask()) != 0).astype(jnp.float32)
        codes = self.bits_to_codes(bits)
        codes = self.maybe_l2norm(codes)

        if self.orthogonal_rotation:
            codes = codes @ self.orthogonal_rot[...].T

        codes = codes.reshape(*codes.shape[:-2], -1)

        if project_out and self.project_out is not None:
            codes = self.project_out(codes)

        if should_transpose:
            codes = jnp.moveaxis(codes, -1, 1)
        return codes

    # -- entropy machinery ---------------------------------------------------

    def _entropy_terms(
        self,
        original_input: jax.Array,   # (b, n, c, d) f32
        inv_temperature: float,
        mask: jax.Array | None,      # (b, n) or None
    ) -> tuple[jax.Array, jax.Array]:
        """Per-sample entropy (mean over tokens) and batch codebook entropy.

        Masked tokens are excluded by weighting; the fractional subsample is
        a gumbel-top-k uniform draw over valid tokens — shape-static,
        replacing the reference's randperm boolean mask (:365-378).
        """
        flat = original_input.reshape(-1, *original_input.shape[-2:])   # (N, c, d)
        num_tokens = flat.shape[0]

        if mask is not None:
            weights = mask.reshape(-1).astype(jnp.float32)       # (N,)
        else:
            weights = jnp.ones((num_tokens,), jnp.float32)

        if self.frac_per_sample_entropy < 1.0:
            num_sampled = max(int(num_tokens * self.frac_per_sample_entropy), 1)
            key = self.rngs.entropy()
            scores = jnp.where(weights > 0, 0.0, -1e9) + jax.random.gumbel(
                key, (num_tokens,)
            )
            _, sel = jax.lax.top_k(scores, num_sampled)
            flat = jnp.take(flat, sel, axis=0)
            weights = jnp.take(weights, sel, axis=0)

        denom = jnp.maximum(weights.sum(), 1e-6)

        chunk = self.entropy_chunk_size
        if chunk is None and self.codebook_size > (1 << 16):
            chunk = 1 << 14                                       # auto
        if self._entropy_fused_active(flat, chunk):
            ent_sum, avg_prob_num = self._fused_entropy_stats(
                flat, weights, inv_temperature
            )
        elif chunk is not None and chunk < self.codebook_size:
            ent_sum, avg_prob_num = self._streamed_entropy_stats(
                flat, weights, inv_temperature, chunk
            )
        else:
            # -2 x.c is euclidean distance up to a constant (reference
            # :374,382); HIGHEST keeps the entropy logits f32-faithful on
            # TPU (the LFQ core is a forced-f32 region in the reference,
            # :312-316)
            codebook = self.maybe_l2norm(self.codebook)           # (K, d)
            distance = -2 * jnp.einsum(
                'ncd,kd->nck', flat, codebook,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            prob = jax.nn.softmax(-distance * inv_temperature, axis=-1)
            ent_sum = (entropy_fn(prob, eps=1e-5) * weights[:, None]).sum()
            avg_prob_num = (prob * weights[:, None, None]).sum(axis=0)

        per_sample_entropy = ent_sum / (denom * flat.shape[1])

        # batch-average distribution, differentiably psum'd across replicas
        avg_prob_num = collectives.psum(avg_prob_num, self.sync_axis)
        avg_prob_den = collectives.psum(denom, self.sync_axis)
        avg_prob = avg_prob_num / avg_prob_den                    # (c, K)
        codebook_entropy = entropy_fn(avg_prob, eps=1e-5).mean()

        return per_sample_entropy, codebook_entropy

    def _entropy_fused_active(self, flat: jax.Array, chunk) -> bool:
        """Route the entropy statistics through the fused Pallas sweeps
        (kernels/lfq_entropy.py). 'auto' = TPU backend and a
        chunked-regime size (the fused sweeps exist to avoid the (N, K)
        HBM stream — below ~2^16 codes XLA's dense softmax is already
        fine). Multi-codebook runs one sweep per codebook."""
        if self.entropy_fused == 'off':
            return False
        if self.entropy_fused == 'on':
            return True
        return (
            jax.default_backend() == 'tpu'
            and chunk is not None
            and chunk < self.codebook_size
        )

    def _fused_entropy_stats(
        self,
        flat: jax.Array,          # (N', 1, d) f32
        weights: jax.Array,       # (N',)
        inv_temperature: float,
    ) -> tuple[jax.Array, jax.Array]:
        """Entropy statistics via the fused Pallas sweeps — the implicit
        codebook is generated inside the kernel and the (N, K) logit
        stream never touches HBM (kernels/lfq_entropy.py; measured 1.9x
        fwd / 1.5x train over the chunked XLA path at K=2^18). Matches
        `_streamed_entropy_stats` to float-accumulation tolerance."""
        from ..kernels.lfq_entropy import (
            code_magnitude, lfq_entropy_stats_fused,
        )

        n, c = flat.shape[0], flat.shape[1]
        block_n = 512 if n >= 512 else 8
        n_pad = -(-n // block_n) * block_n
        if n_pad != n:
            flat = jnp.pad(flat, ((0, n_pad - n), (0, 0), (0, 0)))
            weights = jnp.pad(weights, (0, n_pad - n))
        v = code_magnitude(
            self.codebook_dim, float(self.codebook_scale), self.spherical
        )
        block_k = min(self.codebook_size, 2048)
        ent_sum = jnp.float32(0.0)
        avg_rows = []
        for ci in range(c):                  # one sweep per codebook head
            ent, avgp = lfq_entropy_stats_fused(
                flat[:, ci, :], weights, k=self.codebook_size, v=v,
                inv_temp=float(inv_temperature), block_n=block_n,
                block_k=block_k,
            )
            ent_sum = ent_sum + (ent * weights).sum()
            avg_rows.append(avgp)
        return ent_sum, jnp.stack(avg_rows)

    def _chunk_codes(self, start: jax.Array, size: int) -> jax.Array:
        """Code vectors for implicit-codebook rows [start, start+size) —
        generated arithmetically on the fly (no (K, d) table in memory)."""
        idx = start + jnp.arange(size)
        bits = ((idx[:, None] & self._bit_mask()) != 0).astype(jnp.float32)
        return self.maybe_l2norm(self.bits_to_codes(bits))        # (size, d)

    def _streamed_entropy_stats(
        self,
        flat: jax.Array,          # (N', c, d) f32
        weights: jax.Array,       # (N',)
        inv_temperature: float,
        chunk: int,
    ) -> tuple[jax.Array, jax.Array]:
        """Entropy statistics with the implicit codebook streamed in
        `chunk`-row pieces, never materializing the (N', c, K) probability
        tensor: pass A runs a streaming logsumexp over chunks, pass B
        re-computes each chunk's probabilities against the final logZ and
        accumulates the weighted per-sample-entropy sum and the (c, K)
        batch-average numerator. Chunk bodies are rematerialized
        (jax.checkpoint) so the backward pass stays O(chunk) in memory.
        Mathematically identical to the unchunked softmax path (pinned to
        ~1e-6 by tests/test_lfq.py); 2x the logit FLOPs, which the memory-
        bound large-K regime absorbs."""
        n_chunks = self.codebook_size // chunk
        starts = jnp.arange(n_chunks) * chunk
        nb, c = flat.shape[0], flat.shape[1]

        def logits_for(start):
            codes = self._chunk_codes(start, chunk)               # (k, d)
            distance = -2 * jnp.einsum(
                'ncd,kd->nck', flat, codes,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return -distance * inv_temperature                    # (N', c, k)

        @jax.checkpoint
        def pass_a(carry, start):
            m, s = carry
            logits = logits_for(start)
            m_new = jnp.maximum(m, logits.max(axis=-1))
            s = s * jnp.exp(m - m_new) + jnp.exp(
                logits - m_new[..., None]
            ).sum(axis=-1)
            return (m_new, s), None

        init = (
            jnp.full((nb, c), -jnp.inf, jnp.float32),
            jnp.zeros((nb, c), jnp.float32),
        )
        (m, s), _ = jax.lax.scan(pass_a, init, starts)
        log_z = m + jnp.log(s)                                    # (N', c)

        @jax.checkpoint
        def pass_b(carry, start):
            ent_sum, = carry
            logits = logits_for(start)
            prob = jnp.exp(logits - log_z[..., None])             # (N', c, k)
            ent_sum = ent_sum + (
                entropy_fn(prob, eps=1e-5) * weights[:, None]
            ).sum()
            avg_chunk = (prob * weights[:, None, None]).sum(axis=0)
            return (ent_sum,), avg_chunk                          # (c, k)

        (ent_sum,), avg_chunks = jax.lax.scan(
            pass_b, (jnp.zeros((), jnp.float32),), starts
        )
        # (n_chunks, c, chunk) -> (c, K), chunk-major = global code order
        avg_prob_num = jnp.moveaxis(avg_chunks, 0, 1).reshape(c, -1)
        return ent_sum, avg_prob_num

    # -- forward -----------------------------------------------------------------

    def __call__(
        self,
        x: jax.Array,
        inv_temperature: float = 100.0,
        return_loss_breakdown: bool = False,
        mask: jax.Array | None = None,
    ):
        is_img_or_video = x.ndim >= 4
        should_transpose = default(self.channel_first, is_img_or_video)

        if should_transpose:
            x, layout = to_tokens(x, channel_first=True)

        assert x.shape[-1] == self.dim, (
            f'expected dimension of {self.dim} but received {x.shape[-1]}'
        )

        if self.project_in is not None:
            x = self.project_in(x)

        if self.soft_clamp_input_value is not None:
            clamp = self.soft_clamp_input_value
            x = jnp.tanh(x / clamp) * clamp

        b, n = x.shape[:2]
        x = x.reshape(b, n, self.num_codebooks, self.codebook_dim)

        # the mask may be per-batch-entry (b,) (reference indexes
        # original_input[mask] over dim 0, tests/test_lfq.py:14-18) or the
        # usual per-token (b, n); normalize to (b, n)
        if mask is not None:
            mask = mask.astype(bool)
            if mask.ndim == 1:
                mask = jnp.broadcast_to(mask[:, None], (b, n))

        if self.orthogonal_rotation:
            x = x @ self.orthogonal_rot[...]

        x = self.maybe_l2norm(x)

        orig_dtype = x.dtype
        if self.force_quantization_f32:
            x = x.astype(jnp.float32)

        original_input = x

        # sign quantization (eq. 3)
        codebook_value = jnp.full_like(x, self.codebook_scale)
        quantized = jnp.where(x > 0, codebook_value, -codebook_value)

        indices = (
            (quantized > 0).astype(jnp.int32) * self._bit_mask().astype(jnp.int32)
        ).sum(axis=-1)                                           # (b, n, c)

        quantized = self.maybe_l2norm(quantized)

        # straight-through gradients, optionally through a custom activation
        # (reference lookup_free_quantization.py:105,339-343)
        if self.training:
            x = self.straight_through_activation(x)
            x = x + sg(quantized - x)
        else:
            x = quantized

        zero = jnp.asarray(0.0, jnp.float32)
        if self.training:
            per_sample_entropy, codebook_entropy = self._entropy_terms(
                original_input, inv_temperature, mask
            )
            # 1. per-sample entropy nudged low (confident predictions)
            # 2. codebook entropy nudged high (uniform code usage)
            entropy_aux_loss = (
                per_sample_entropy - self.diversity_gamma * codebook_entropy
            )
        else:
            entropy_aux_loss = per_sample_entropy = codebook_entropy = zero

        if self.training and self.experimental_softplus_entropy_loss:
            entropy_aux_loss = jax.nn.softplus(
                entropy_aux_loss + self.entropy_loss_offset
            )

        if self.training and self.commitment_loss_weight > 0.0:
            commit = (original_input - sg(quantized)) ** 2
            if mask is not None:
                w = mask.astype(jnp.float32)[..., None, None]
                commit_loss = (commit * w).sum() / jnp.maximum(
                    w.sum() * commit.shape[-1] * commit.shape[-2], 1e-6
                )
            else:
                commit_loss = commit.mean()
        else:
            commit_loss = zero

        x = x.astype(orig_dtype)

        if self.orthogonal_rotation:
            x = x @ self.orthogonal_rot[...].T

        x = x.reshape(b, n, -1)

        if self.project_out is not None:
            x = self.project_out(x)

        if should_transpose:
            x = layout.restore(x)
            indices = layout.restore_indices(indices)

        if not self.keep_num_codebooks_dim:
            indices = indices[..., 0]

        aux_loss = (
            entropy_aux_loss * self.entropy_loss_weight
            + commit_loss * self.commitment_loss_weight
        )

        ret = Return(x, indices, aux_loss)
        if not return_loss_breakdown:
            return ret
        return ret, LossBreakdown(per_sample_entropy, codebook_entropy, commit_loss)
