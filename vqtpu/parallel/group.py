"""Group-axis (expert-parallel-style) execution for the Grouped composites.

`GroupedResidualVQ` / `GroupedResidualFSQ` / `GroupedResidualLFQ` run their
feature-dim groups as a Python loop over independent member modules
(reference residual_vq.py:634-724 semantics — each group owns its own
codebooks/EMA state). On a single chip that loop serializes g sub-envelope
selections (the certified GroupedRVQ glue gap, BASELINE.md); on a mesh the
groups are embarrassingly parallel: every device owns one group's member
state and its feature slice of the SAME tokens.

This module provides that mapping: member states are stacked along a new
leading axis and sharded over a `group` mesh axis; a shard_map body runs the
ordinary member forward per local group. Composes with a `data` axis (batch
sharding + the members' own `sync_axis` psum'd EMA stats) on a 2D
(data x group) mesh, in which case scalar losses are pmean'd over the data
axis (the usual DP loss semantics; exact for equal shard sizes).

RNG semantics: all members share one `nnx.Rngs` (the serial loop interleaves
draws through a single counter, so groups see different keys). Group-local
execution instead folds the group index into every PRNG key leaf
(`fold_in(key, g)`), giving each group an independent stream; counts advance
identically across groups (same static program), so writeback restores the
original (unfolded) key with the advanced count. Deterministic forwards
(argmax selection, no expiry/kmeans draws) are BIT-IDENTICAL to the serial
loop; stochastic draws are decorrelated across groups but not
draw-for-draw equal to serial interleaving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P


def _is_key_leaf(leaf) -> bool:
    return hasattr(leaf, 'dtype') and jax.dtypes.issubdtype(
        leaf.dtype, jax.dtypes.prng_key
    )


def _fold_keys(state, g: int):
    """Fold the group index into every PRNG key leaf (identity for g=0)."""
    if g == 0:
        return state
    return jax.tree.map(
        lambda l: jax.random.fold_in(l, g) if _is_key_leaf(l) else l, state
    )


def split_members(gmodule):
    """(shared graphdef, per-group states, members) for a Grouped composite.

    Asserts all members trace to the same graphdef — true by construction
    (GroupedResidual* builds every member from identical kwargs)."""
    members = list(gmodule.rvqs)
    graphdefs, states = zip(*(nnx.split(m) for m in members))
    # graphdef __eq__ compares per-instance callables by identity, so check
    # the state STRUCTURE instead; group-0's graphdef then merges every
    # group's state (members are built from identical kwargs)
    s0 = jax.tree.structure(states[0])
    assert all(jax.tree.structure(s) == s0 for s in states[1:]), (
        'group members must be structurally identical'
    )
    return graphdefs[0], list(states), members


def _stack_states(states):
    return jax.tree.map(lambda *ls: jnp.stack(ls), *states)


def _is_count_path(path) -> bool:
    # RngStream count leaves flatten as .../['count']/.value
    return any("'count'" in str(k) for k in path)


def _writeback(members, new_stacked, orig_stacked):
    """Scatter the post-step stacked state back into the member modules.

    PRNG key leaves take slice 0 (the original, unfolded key). RNG count
    leaves reconstruct the SERIAL counter: the members share one stream, so
    the serial loop advances it by G*d draws while each parallel copy
    advances its own by d (identical across groups — same static program);
    final = orig + G*(new - orig). Keeps later shared-stream draws (e.g.
    the per-step dropout index) bit-aligned with serial execution."""
    groups = len(members)

    for i, member in enumerate(members):

        def leaf_i(path, new, orig):
            if _is_key_leaf(new):
                return new[0]
            if _is_count_path(path):
                return orig[0] + groups * (new[0] - orig[0])
            return new[i]

        state_i = jax.tree_util.tree_map_with_path(
            leaf_i, new_stacked, orig_stacked
        )
        nnx.update(member, state_i)


# jitted shard_map bodies cached so a training loop compiles once
# (same rationale as tp.py's _TP_APPLY_CACHE)
_GP_CACHE: dict = {}
_GP_CACHE_MAX = 64


def _gp_cache(key, build):
    mapped = _GP_CACHE.get(key)
    if mapped is None:
        if len(_GP_CACHE) >= _GP_CACHE_MAX:  # FIFO bound, no leak
            _GP_CACHE.pop(next(iter(_GP_CACHE)))
        mapped = _GP_CACHE[key] = build()
    return mapped


def _split_stack(gmodule, x):
    """x (.., g*dpg, ..) -> (g, ..) stacked feature chunks along a new
    leading group axis (split over `split_dim` exactly like the serial
    forward)."""
    chunks = jnp.split(x, gmodule.groups, axis=gmodule.split_dim)
    return jnp.stack(chunks)


def _concat_groups(stacked, split_dim: int):
    return jnp.concatenate(
        [stacked[i] for i in range(stacked.shape[0])], axis=split_dim
    )


def group_parallel_forward(
    gmodule,
    x: jax.Array,
    mesh: Mesh,
    *,
    group_axis: str = 'group',
    data_axis: str | None = None,
    indices=None,
    mask: jax.Array | None = None,
    return_all_codes: bool = False,
    update_state: bool = True,
    **fkwargs,
):
    """Run a Grouped composite forward with groups sharded over `group_axis`.

    Same returns and state updates as calling `gmodule(x, ...)` (the serial
    Python loop); extra `fkwargs` pass through to each member
    (`sample_codebook_temp`, `freeze_codebook`, ...). With `data_axis` set,
    the batch dim of `x`/`mask` additionally shards over it; members built
    with `sync_axis=data_axis` then psum their EMA statistics inside the
    same shard_map, and scalar losses come back pmean'd over data.

    The group mesh axis size must divide `groups`; each shard loops over its
    `groups / axis_size` local members.
    """
    groups = gmodule.groups
    axis_size = mesh.shape[group_axis]
    assert groups % axis_size == 0, (groups, axis_size)
    g_local = groups // axis_size
    split_dim = gmodule.split_dim
    assert x.shape[split_dim] == gmodule.dim

    # member returns: (quantized, indices[, commit_losses][, all_codes]);
    # GroupedResidualFSQ members return no loss tensor
    has_loss = type(gmodule).__name__ != 'GroupedResidualFSQ'

    return_ce_loss = indices is not None and len(indices) > 0

    # shared dropout index: drawn once OUTSIDE the mesh from the shared
    # rngs, replicated to every group (the serial forward draws it the same
    # way) — must happen BEFORE the state snapshot so the count advance
    # persists through writeback
    first = gmodule.rvqs[0]
    dropout_index = None
    if (
        gmodule.training
        and getattr(first, 'quantize_dropout', False)
        and not return_ce_loss
    ):
        dropout_index = first._draw_dropout_index()

    graphdef, states, members = split_members(gmodule)
    stacked = _stack_states([_fold_keys(s, g) for g, s in enumerate(states)])
    state_specs = jax.tree.map(lambda _: P(group_axis), stacked)

    xg = _split_stack(gmodule, x)
    # batch is axis 1 of every stacked tensor in both layouts:
    # tokens (g, b, n, dpg) / fmap (g, b, dpg, h, w); indices follow suit
    gd_spec = (
        P(group_axis, data_axis) if data_axis is not None else P(group_axis)
    )
    mask_spec = P(data_axis) if data_axis is not None else P()

    if return_ce_loss:
        ind_g = jnp.stack(list(indices))

    static_key = tuple(sorted(fkwargs.items()))
    cache_key = (
        'fwd', graphdef, mesh, group_axis, data_axis, g_local, has_loss,
        return_ce_loss, return_all_codes, dropout_index is not None,
        mask is not None, static_key,
    )

    def build():
        def run_members(stacked_state, xg, ind_g, dropout_index, mask):
            outs, new_states = [], []
            for i in range(g_local):
                member = nnx.merge(
                    graphdef, jax.tree.map(lambda l: l[i], stacked_state)
                )
                kwargs = dict(fkwargs)
                if mask is not None:
                    kwargs['mask'] = mask
                if return_ce_loss:
                    out = member(xg[i], indices=ind_g[i], **kwargs)
                else:
                    out = member(
                        xg[i],
                        return_all_codes=return_all_codes,
                        rand_quantize_dropout_index=dropout_index,
                        **kwargs,
                    )
                _, new_state = nnx.split(member)
                outs.append(out)
                new_states.append(new_state)
            stacked_out = jax.tree.map(lambda *ls: jnp.stack(ls), *outs)
            return stacked_out, _stack_states(new_states)

        def body(stacked_state, *args):
            it = iter(args)
            a_x = next(it)
            a_ind = next(it) if return_ce_loss else None
            a_drop = next(it) if dropout_index is not None else None
            a_mask = next(it) if mask is not None else None
            out, new_stacked = run_members(
                stacked_state, a_x, a_ind, a_drop, a_mask
            )
            if return_ce_loss:
                q, ce = out
                if data_axis is not None:
                    ce = jax.lax.pmean(ce, data_axis)
                return (q, ce), new_stacked
            out = list(out)
            if data_axis is not None and has_loss:
                # losses have no batch dim; average the per-data-shard values
                pos = 2
                out[pos] = jax.lax.pmean(out[pos], data_axis)
            return tuple(out), new_stacked

        in_specs = [state_specs, gd_spec]
        if return_ce_loss:
            in_specs.append(gd_spec)
        if dropout_index is not None:
            in_specs.append(P())
        if mask is not None:
            in_specs.append(mask_spec)

        if return_ce_loss:
            out_spec = (gd_spec, P(group_axis))
        else:
            specs = [gd_spec, gd_spec]                   # quantized, indices
            if has_loss:
                specs.append(P(group_axis))              # (g, q) losses
            if return_all_codes:
                # (g, q, b, n, dpg): batch at axis 2
                specs.append(
                    P(group_axis, None, data_axis)
                    if data_axis is not None else P(group_axis)
                )
            out_spec = tuple(specs)

        return jax.jit(jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(out_spec, state_specs),
            check_vma=False,
        ))

    mapped = _gp_cache(cache_key, build)

    args = [xg]
    if return_ce_loss:
        args.append(ind_g)
    if dropout_index is not None:
        args.append(dropout_index)
    if mask is not None:
        args.append(mask)

    stacked_out, new_stacked = mapped(stacked, *args)
    if update_state:
        # (skip for pure-eval serving loops, or when tracing this call
        # inside an outer jit — writing tracers into module state leaks)
        _writeback(members, new_stacked, stacked)

    if return_ce_loss:
        quantized_g, ce_g = stacked_out
        return _concat_groups(quantized_g, split_dim), ce_g.sum()

    out = list(stacked_out)
    quantized = _concat_groups(out[0], split_dim)
    rest = out[1:]
    if return_all_codes:
        # serial returns all_codes as a tuple of per-group arrays
        *mid, codes_g = rest
        codes = tuple(codes_g[i] for i in range(codes_g.shape[0]))
        return (quantized, *mid, codes)
    return (quantized, *rest)


def group_parallel_output_from_indices(
    gmodule,
    indices,
    mesh: Mesh,
    *,
    group_axis: str = 'group',
    data_axis: str | None = None,
):
    """`gmodule.get_output_from_indices(indices)` with groups sharded over
    `group_axis` (serving decode: each device decodes its group's codes from
    its own codebooks). `indices`: tuple/array of per-group index tensors,
    exactly as the serial method takes."""
    groups = gmodule.groups
    axis_size = mesh.shape[group_axis]
    assert groups % axis_size == 0, (groups, axis_size)
    g_local = groups // axis_size
    split_dim = gmodule.split_dim

    graphdef, states, members = split_members(gmodule)
    stacked = _stack_states(states)          # decode draws no rngs
    state_specs = jax.tree.map(lambda _: P(group_axis), stacked)

    ind_g = jnp.stack(list(indices))
    gd_spec = (
        P(group_axis, data_axis) if data_axis is not None else P(group_axis)
    )

    cache_key = ('decode', graphdef, mesh, group_axis, data_axis, g_local)

    def build():
        def body(stacked_state, ind_g):
            outs = []
            for i in range(g_local):
                member = nnx.merge(
                    graphdef, jax.tree.map(lambda l: l[i], stacked_state)
                )
                outs.append(member.get_output_from_indices(ind_g[i]))
            return jnp.stack(outs)

        return jax.jit(jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(state_specs, gd_spec),
            out_specs=gd_spec,
            check_vma=False,
        ))

    out_g = _gp_cache(cache_key, build)(stacked, ind_g)
    return _concat_groups(out_g, split_dim)
