"""Cross-replica collectives, parameterized by an optional mesh axis name.

This is the TPU-native replacement for the reference's torch.distributed
plumbing (component D1 in SURVEY.md §2; reference
vector_quantize_pytorch.py:193-229,334-336,603-607). Instead of a `use_ddp`
flag and NCCL all_reduce calls, every quantizer takes `sync_axis: str | None`.
When the forward runs inside `shard_map` / `pjit` over a mesh that binds that
axis, statistics are reduced with `lax.psum` (which rides ICI within a slice
and DCN across hosts, and is differentiable — covering the reference's
`torch.distributed.nn.all_reduce` used for the LFQ entropy loss,
lookup_free_quantization.py:37-43). When `sync_axis is None` the functions
are identity, which is the single-replica path.

Seed agreement (reference residual_vq.py:96-102) needs no collective at all:
all replicas derive the same `jax.random` key from the shared rng stream.
"""

from __future__ import annotations

import functools

import jax


def psum(x, axis: str | None):
    """Plain psum. Gradient semantics under shard_map(check_vma=False):
    the transpose is another psum — i.e. cotangents are summed across the
    axis, exactly matching torch.distributed.nn.all_reduce's backward
    (what the reference uses for the LFQ entropy loss,
    lookup_free_quantization.py:37-43). For tensor-parallel lookups, whose
    contract is 'replicated cotangent flows to each partial', use
    `psum_exact` instead."""
    if axis is None:
        return x
    return jax.lax.psum(x, axis_name=axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_exact(x, axis: str):
    return jax.lax.psum(x, axis_name=axis)


def _psum_exact_fwd(x, axis):
    return _psum_exact(x, axis), None


def _psum_exact_bwd(axis, _, g):
    return (g,)


_psum_exact.defvjp(_psum_exact_fwd, _psum_exact_bwd)


def psum_exact(x, axis: str | None):
    """psum with the 'sum of partials -> replicated value' transpose: the
    cotangent passes through UNCHANGED to each shard's partial contribution.

    Under `shard_map(..., check_vma=False)` the default transpose of
    `lax.psum` is another psum, which multiplies gradients by the axis size
    on activation paths (each shard's partial gets the world-summed
    cotangent) — measured as a mixed 8x inflation on SimVQ's sharded lookup
    before this fix. Use THIS for cross-shard sums whose gradient contract
    is 'replicated cotangent flows to each partial', i.e. every
    tensor-parallel lookup."""
    if axis is None:
        return x
    return _psum_exact(x, axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _all_gather_exact(x, axis: str, concat_axis: int):
    return jax.lax.all_gather(x, axis_name=axis, tiled=True, axis=concat_axis)


def _all_gather_exact_fwd(x, axis, concat_axis):
    return _all_gather_exact(x, axis, concat_axis), x.shape[concat_axis]


def _all_gather_exact_bwd(axis, concat_axis, local_size, g):
    row0 = jax.lax.axis_index(axis) * local_size
    return (
        jax.lax.dynamic_slice_in_dim(g, row0, local_size, axis=concat_axis),
    )


_all_gather_exact.defvjp(_all_gather_exact_fwd, _all_gather_exact_bwd)


def all_gather_exact(x, axis: str | None, *, concat_axis: int = 0):
    """all_gather whose transpose hands each shard ITS OWN block of the
    cotangent, unscaled — the gather analogue of `psum_exact`.

    Under `shard_map(..., check_vma=False)` the default transpose of
    `lax.all_gather` is psum_scatter: when the gathered value feeds a loss
    computed identically on every shard (a replicated cotangent), each
    shard's local block would receive the cotangent summed over all shards —
    i.e. scaled by the axis size. Use THIS whenever the downstream cotangent
    is replicated across the axis (any loss computed per-shard from the full
    gathered tensor), e.g. the row-sharded codebook's distance gather feeding
    CE/diversity losses or gumbel straight-through."""
    if axis is None:
        return x
    return _all_gather_exact(x, axis, concat_axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _psum_in_bwd(x, axis: str):
    return x


def _psum_in_bwd_fwd(x, axis):
    return x, None


def _psum_in_bwd_bwd(axis, _, g):
    return (jax.lax.psum(g, axis_name=axis),)


_psum_in_bwd.defvjp(_psum_in_bwd_fwd, _psum_in_bwd_bwd)


def psum_in_bwd(x, axis: str | None):
    """Identity forward; psum of the cotangent in backward (the f/g
    identity-psum pair from the shard_map manual-parallelism recipe).

    Apply to a REPLICATED operand that feeds shard-local compute whose
    per-shard gradient contribution is partial (each shard only sees the
    contribution through its own columns/rows) — the backward psum
    re-assembles the full gradient, replicated, so 'replicated' parameters
    upstream stay bit-identical across shards. E.g. the token tensor feeding
    a row-sharded distance computation."""
    if axis is None:
        return x
    return _psum_in_bwd(x, axis)


def pmean(x, axis: str | None):
    if axis is None:
        return x
    return jax.lax.pmean(x, axis_name=axis)


def axis_size(axis: str | None) -> int:
    if axis is None:
        return 1
    return jax.lax.axis_size(axis)


def all_gather(x, axis: str | None, *, tiled: bool = True, concat_axis: int = 0):
    """Gather a per-replica buffer along the sync axis. Used for pooling
    dead-code replacement / kmeans candidates across data-parallel shards
    (fixed-size per-shard buffers replace the reference's variably-sized
    gather dance, vector_quantize_pytorch.py:193-229)."""
    if axis is None:
        return x
    return jax.lax.all_gather(x, axis_name=axis, tiled=tiled, axis=concat_axis)


def axis_index(axis: str | None):
    if axis is None:
        return 0
    return jax.lax.axis_index(axis)


def axis_is_bound(axis: str | None) -> bool:
    """True iff `axis` is a mesh axis bound in the current trace (i.e. we are
    inside a shard_map/pjit region that binds it). This is what lets a module
    carry `code_axis` metadata and transparently switch between the
    full-codebook path (outside any mesh: state leaves hold the full logical
    arrays) and the row-sharded path (inside shard_map with the codebook
    leaves sharded over `axis`: the same leaves hold the local rows)."""
    if axis is None:
        return False
    try:
        # the only public-ish trace-time axis-env probe in jax 0.9
        names = jax.core.unsafe_get_axis_names_DO_NOT_USE()
    except Exception:  # pragma: no cover - API moved; fall back to probing
        # A jax upgrade may change both the probe API and the unbound-axis
        # exception type; an unexpected exception here must mean "unbound"
        # (the plain out-of-mesh path: checkpointing, decode, construction),
        # never a crash — pinned by test_parallel.py's monkeypatch test.
        try:
            jax.lax.axis_size(axis)
            return True
        except Exception:
            return False
    return axis in names
