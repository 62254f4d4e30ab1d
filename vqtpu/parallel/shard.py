"""Mesh construction and shard_map training utilities (component D1).

The TPU-native replacement for the reference's DDP integration: instead of
wrapping the model in DistributedDataParallel and letting the library fire
NCCL all_reduces from inside forward (reference
vector_quantize_pytorch.py:405-413,603-607), the quantizers take
`sync_axis='data'` and the training step runs under `shard_map` over a
`jax.sharding.Mesh`. Inside the mapped region every codebook statistic is a
`psum` over that axis (riding ICI within a slice, DCN across hosts), and
parameter gradients are `pmean`-ed — so the model state stays bit-identical
across replicas by construction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(
    axis_names: tuple[str, ...] = ('data',),
    shape: tuple[int, ...] | None = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices. With the default single
    'data' axis, all devices form one data-parallel ring."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        assert len(axis_names) == 1
        shape = (len(devices),)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


class _TrainState(nnx.Module):
    def __init__(self, model: nnx.Module, optimizer: nnx.Optimizer):
        self.model = model
        self.optimizer = optimizer


class DataParallelTrainer:
    """shard_map-based data-parallel trainer for models containing vqtpu
    quantizers.

    The model's quantizers must be constructed with `sync_axis=<axis>` so
    their EMA statistics psum over the mesh; gradients are pmean-ed here.
    Model/optimizer state is replicated (P()); the batch is sharded along
    its leading dim over the data axis.

    Usage:
        mesh = make_mesh(('data',))
        trainer = DataParallelTrainer(model, optax.adamw(1e-3), loss_fn, mesh)
        loss = trainer.step(global_batch)
    """

    def __init__(
        self,
        model: nnx.Module,
        tx,
        loss_fn: Callable,
        mesh: Mesh,
        axis: str = 'data',
        batch_spec: P | None = None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        self.mesh = mesh
        self.axis = axis
        self.batch_spec = batch_spec if batch_spec is not None else P(axis)

        optimizer = nnx.Optimizer(model, tx, wrt=nnx.Param)
        self._ts = _TrainState(model, optimizer)
        self._graphdef, _ = nnx.split(self._ts)
        self._jitted = None

    def _build(self):
        graphdef = self._graphdef
        loss_fn = self.loss_fn
        axis = self.axis

        def body(state, batch):
            ts = nnx.merge(graphdef, state)

            def compute_loss(model):
                return loss_fn(model, batch)

            loss, grads = nnx.value_and_grad(compute_loss)(ts.model)
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            ts.optimizer.update(ts.model, grads)
            _, new_state = nnx.split(ts)
            return new_state, loss

        mapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(), self.batch_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(mapped)

    def step(self, batch) -> jax.Array:
        """One optimizer step on a *global* batch (sharded over the mesh);
        updates the model and optimizer in place, returns the mean loss."""
        if self._jitted is None:
            self._jitted = self._build()
        _, state = nnx.split(self._ts)
        new_state, loss = self._jitted(state, batch)
        nnx.update(self._ts, new_state)
        return loss


def eval_step_fn(model: nnx.Module, mesh: Mesh, axis: str = 'data',
                 batch_spec: P | None = None):
    """Build a jitted, shard_map'd eval forward for a model (replicated
    params, batch sharded over `axis`). Returns f(batch) -> model outputs."""
    graphdef, state = nnx.split(model)
    batch_spec = batch_spec if batch_spec is not None else P(axis)

    def body(state, batch):
        m = nnx.merge(graphdef, state)
        return m(batch)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    jitted = jax.jit(mapped)

    def run(batch):
        _, st = nnx.split(model)
        return jitted(st, batch)

    return run


# -- codebook sharding (tensor-parallel codebooks over ICI) ----------------------

def sharded_nearest_code(
    x: jax.Array,
    embed_shard: jax.Array,
    axis: str,
    metric: str = 'euclidean',
) -> jax.Array:
    """Nearest-code selection against a codebook sharded over mesh axis
    `axis` (rows split across devices) — the north-star extension beyond the
    reference's replicate-everything design (SURVEY.md §2, TP row).

    Each device computes a local (best score, local argbest) over its rows
    with the fused Pallas kernel, reconstructs the winning score with one
    gather, then the global winner is reduced over the axis. Tie-breaking:
    lowest global index wins, matching the unsharded argmin.

    x: (n, d) replicated; embed_shard: (c_local, d) local rows.
    Returns (n,) global int32 indices.
    """
    from ..kernels.distance import nearest_code_xla

    c_local = embed_shard.shape[0]
    rank = jax.lax.axis_index(axis)

    # the selection returns the exact score values its argmax reduced
    # (per-column scores are shard-placement-invariant), so the cross-shard
    # winner comparison needs NO recompute — r1 gathered the winning row and
    # re-derived its score (one jnp.take + a HIGHEST dot over all n tokens),
    # which measured +92% overhead at n=1M, c_local=4096 on v5e.
    local_idx, score = nearest_code_xla(
        x, embed_shard, metric, return_best=True
    )                                                            # (n,), (n,)

    return _global_winner_index(local_idx, score, axis, c_local)


def _global_winner_index(
    local_idx: jax.Array, score: jax.Array, axis: str, c_local: int
) -> jax.Array:
    """Cross-shard winner reduction for row-sharded selection, as pure
    elementwise ops + pmax/pmin/psum — an all_gather + argmax-over-world +
    take_along_axis formulation costs +12.5 ms at n=1M on v5e (XLA's
    elementwise-gather lowering), this one ~+0
    (benchmarks/tp_selection_tpu.py). Ties: the lowest rank holding the best
    score wins, and within a shard argmax picked the lowest local index —
    global index order is rank-major, so this matches the unsharded
    argmax's first-index tie-break exactly."""
    rank = jax.lax.axis_index(axis)
    world = jax.lax.axis_size(axis)
    best = jax.lax.pmax(score, axis)                             # (n,)
    is_best = score == best
    cand_rank = jnp.where(is_best, rank, world)
    win_rank = jax.lax.pmin(cand_rank, axis)                     # (n,)
    mine = is_best & (rank == win_rank)
    global_idx = jnp.where(mine, local_idx + rank * c_local, 0)
    return jax.lax.psum(global_idx, axis)


def sharded_quantize_lookup_bf16(
    x: jax.Array,
    embed_shard: jax.Array,
    axis: str,
    metric: str = 'euclidean',
) -> tuple[jax.Array, jax.Array]:
    """The bf16 serving tier against a row-sharded codebook: 2 MXU passes
    per shard (bf16 scores with f32 accumulation + the 1-pass local one-hot
    lookup), winner-reduced over `axis`.

    Bit-identical to the unsharded tier
    (kernels.distance._quantize_lookup_bf16): per-column scores are
    shard-placement-invariant (same formulation, same operands), the winner
    reduction reproduces the first-index tie-break, and the lookup
    contributes each token's exact bf16 row from the one shard that owns it
    (one-hot products are exact; the psum adds zeros). Pinned by
    tests/test_tp.py::test_code_sharded_bf16_tier_matches_unsharded.

    x: (n, d) replicated; embed_shard: (c_local, d) local rows.
    Returns ((n,) global int32 indices, (n, d) bf16 quantized rows).
    """
    from . import collectives
    from ..kernels.distance import argmax_first_with_best

    c_local = embed_shard.shape[0]
    xb = x.astype(jnp.bfloat16)
    eb = embed_shard.astype(jnp.bfloat16)
    scores = jnp.einsum(
        'nd,cd->nc', xb, eb, preferred_element_type=jnp.float32
    )
    if metric == 'euclidean':
        scores = scores - 0.5 * (eb.astype(jnp.float32) ** 2).sum(-1)
    local_idx, score = argmax_first_with_best(scores)
    global_idx = _global_winner_index(local_idx, score, axis, c_local)

    row0 = jax.lax.axis_index(axis) * c_local
    # lookup: same crossover as sharded_gather_codes/gather_codes — bf16
    # one-hot is 1 MXU pass LINEAR in c_local, the masked row gather is
    # ~flat; the one-hot-always r3 formulation cost +44% at c=4096 world=1
    # (tools/tpu_r4_logs/tp_bf16_tier.log). Both are exact in bf16.
    if jax.default_backend() == 'tpu' and c_local <= 512 * 3:
        onehot = local_onehot_from_global(global_idx, c_local, row0)
        out = jnp.einsum(
            'nc,cd->nd', onehot.astype(jnp.bfloat16), eb,
            preferred_element_type=jnp.float32,
        )
    else:
        local = global_idx - row0
        safe = jnp.where((local >= 0) & (local < c_local), local, c_local)
        padded = jnp.concatenate(
            [eb, jnp.zeros((1, eb.shape[1]), eb.dtype)], axis=0)
        out = jnp.take(padded, safe, axis=0)   # bf16 rows; foreign -> 0
    out = collectives.psum_exact(out, axis)
    return global_idx, out.astype(jnp.bfloat16)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _slice_local_cols(full, c_local: int, code_axis: str):
    row0 = jax.lax.axis_index(code_axis) * c_local
    return jax.lax.dynamic_slice_in_dim(full, row0, c_local, axis=-1)


def _slice_local_cols_fwd(full, c_local, code_axis):
    return _slice_local_cols(full, c_local, code_axis), full.shape[-1]


def _slice_local_cols_bwd(c_local, code_axis, c_full, g):
    row0 = jax.lax.axis_index(code_axis) * c_local
    zeros = jnp.zeros((*g.shape[:-1], c_full), g.dtype)
    scattered = jax.lax.dynamic_update_slice_in_dim(zeros, g, row0, axis=-1)
    # each shard contributes the cotangent of its own column window; the
    # psum re-assembles the FULL cotangent, replicated, so the replicated
    # upstream tensor (e.g. a straight-through one-hot over global codes)
    # receives identical gradients on every shard
    return (jax.lax.psum(scattered, code_axis),)


_slice_local_cols.defvjp(_slice_local_cols_fwd, _slice_local_cols_bwd)


def slice_local_cols(full: jax.Array, c_local: int, code_axis: str) -> jax.Array:
    """Slice THIS shard's code-column window [rank*c_local, (rank+1)*c_local)
    out of a replicated (..., c) tensor, with the gradient-correct transpose:
    the backward scatters each shard's cotangent back into its window and
    psums over the axis, yielding the full replicated cotangent. Use instead
    of a raw `dynamic_slice_in_dim` whenever the sliced tensor is
    differentiable (e.g. a gumbel straight-through one-hot)."""
    return _slice_local_cols(full, c_local, code_axis)


def local_onehot_from_global(
    ind: jax.Array, c_local: int, row0: jax.Array
) -> jax.Array:
    """One-hot of global code indices over THIS shard's row window
    [row0, row0 + c_local): (...,) int -> (..., c_local) f32 with zero rows
    for codes owned by other shards. The building block for row-sharded
    lookups and EMA statistics.

    `jax.nn.one_hot` already produces an all-zero row for any out-of-range
    index (negative or >= c_local), so the window mask IS the one-hot — no
    separate where/multiply. The r3 masked formulation added two extra
    elementwise passes over the (n, c) tensor that XLA did not fuse into
    the consuming matmul (measured +126% on world-1 sharded decode at
    c=512, benchmarks/decode_tpu.py --sharded)."""
    return jax.nn.one_hot(ind - row0, c_local, dtype=jnp.float32)


def sharded_gather_codes(
    embed_shard: jax.Array,
    indices: jax.Array,
    code_axis: str,
    precision=jax.lax.Precision.HIGHEST,
    _force: str | None = None,
) -> jax.Array:
    """Row lookup against a codebook sharded over `code_axis`:
    (c_local, d), global (...,) -> (..., d). Each token's row lives on
    exactly one shard, which contributes its exact row; the psum over
    `code_axis` is then a masked broadcast, not a sum of parts.

    Two formulations with the SAME crossover as the unsharded
    kernels.distance.gather_codes, applied to the LOCAL codebook size:

    - small c_local: local one-hot matmul (bit-exact at HIGHEST; fuses).
    - large c_local: masked contiguous row gather — clamp the local index,
      jnp.take the row (flat in c_local, ~60% of the HBM floor), zero it if
      this shard does not own the code. The r3 one-hot-always formulation
      was linear in c_local (+787% at c=2048 world=1) and its (n, c)
      one-hot construction at c=65536 crashed the TPU worker
      (benchmarks/decode_tpu.py --sharded, round 4).

    `_force` ('take' | 'onehot') pins a formulation for tests — both are
    bit-exact, so CPU parity tests cover each regardless of the crossover."""
    from . import collectives

    c_local = embed_shard.shape[0]
    row0 = jax.lax.axis_index(code_axis) * c_local
    flat = indices.reshape(-1)

    if embed_shard.dtype == jnp.bfloat16:
        # bf16 operands are exact under DEFAULT (1 MXU pass with f32
        # accumulation); HIGHEST would upcast and run ~3x slower — same
        # rationale as kernels.distance.gather_codes
        passes = 1
    else:
        passes = 3 if (
            embed_shard.dtype == jnp.float32
            and precision == jax.lax.Precision.HIGHEST
        ) else 1
    crossover = 512 * 3 // passes
    use_take = (
        jax.default_backend() != 'tpu' or c_local > crossover
    ) if _force is None else (_force == 'take')

    if use_take:
        # route foreign tokens to an appended all-zero row instead of
        # mask-multiplying the gathered (n, d) tensor — one fewer full
        # elementwise pass, and no upcast (zeros are exact in any dtype)
        local = flat - row0
        mine = (local >= 0) & (local < c_local)
        safe = jnp.where(mine, local, c_local)
        padded = jnp.concatenate(
            [embed_shard, jnp.zeros((1,) + embed_shard.shape[1:],
                                    embed_shard.dtype)], axis=0)
        out = jnp.take(padded, safe, axis=0)
    elif embed_shard.dtype == jnp.bfloat16:
        onehot = local_onehot_from_global(flat, c_local, row0)
        out = jnp.einsum(
            'nc,cd->nd', onehot.astype(jnp.bfloat16), embed_shard,
            preferred_element_type=jnp.float32,
        )
    else:
        onehot = local_onehot_from_global(flat, c_local, row0)
        out = jnp.einsum(
            'nc,cd->nd', onehot, embed_shard.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    # psum_exact: identity transpose — the plain psum transpose inflates
    # embed/transform gradients by the axis size under check_vma=False
    out = collectives.psum_exact(out, code_axis)
    return out.reshape(*indices.shape, embed_shard.shape[-1]).astype(embed_shard.dtype)
