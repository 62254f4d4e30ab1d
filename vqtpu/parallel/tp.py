"""Tensor-parallel codebook plumbing: partition specs + trainer glue.

`Codebook(code_axis='code')` modules hold the FULL logical codebook at rest
and switch to row-local behavior inside a shard_map that binds the axis
(codebook.Codebook._code_parallel). What remains is mechanical: build the
`PartitionSpec` tree that shards exactly the per-code state leaves over the
code axis (everything else replicated), and wrap train/eval steps in a
shard_map with those specs. This module provides both.

This is the north-star extension beyond the reference — the reference keeps
the full codebook on every rank (vector_quantize_pytorch.py:603-607); here a
`VectorQuantize(codebook_size=1M, code_axis='code')` stores 1/world of the
rows per device and selection/EMA/expiry/kmeans ride psum/all_gather over
ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from flax import nnx
from jax.sharding import Mesh, PartitionSpec as P

# Modules participate in code sharding declaratively: any module with a
# non-None `code_axis` attribute and a `_code_sharded_leaves` mapping
# {leaf_name: position of the code-row axis FROM THE END} gets those leaves
# sharded. Codebook declares its EMA state; SimVQ its frozen codebook.


def _key_str(entry) -> str:
    if isinstance(entry, jtu.DictKey):
        return str(entry.key)
    if isinstance(entry, jtu.GetAttrKey):
        return str(entry.name)
    if isinstance(entry, jtu.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jtu.FlattenedIndexKey):
        return str(entry.key)
    return str(entry)


def find_sharded_codebooks(model: nnx.Module):
    """All submodules that declare code sharding (`code_axis` set and a
    `_code_sharded_leaves` mapping), with their attribute paths."""
    out = []
    for path, node in nnx.iter_graph(model):
        # (nnx.Rngs answers any getattr with a fresh RngStream — require the
        # declared types)
        if (
            isinstance(node, nnx.Module)
            and isinstance(getattr(node, 'code_axis', None), str)
            and isinstance(getattr(node, '_code_sharded_leaves', None), dict)
        ):
            out.append((tuple(str(p) for p in path), node))
    return out


def find_code_partial_grad_paths(model: nnx.Module):
    """Paths of REPLICATED submodules whose parameter gradients are partial
    per code shard (declared via `_code_partial_grad_submodules`, e.g.
    SimVQ's row-wise codebook transform): the trainer must psum their grads
    over the owning module's code axis."""
    out = []
    for path, node in nnx.iter_graph(model):
        # NB: nnx.Rngs answers ANY getattr with a fresh RngStream — require
        # the declared types, not just truthiness
        subs = getattr(node, '_code_partial_grad_submodules', None)
        axis = getattr(node, 'code_axis', None)
        if isinstance(subs, (tuple, list)) and isinstance(axis, str):
            for s in subs:
                out.append((tuple(str(p) for p in path) + (str(s),), axis))
    return out


def psum_partial_grads(grads, partial_paths):
    """psum gradient leaves under the declared partial-grad paths over their
    code axis (identity for everything else)."""
    if not partial_paths:
        return grads

    def fix(path, g):
        keys = [_key_str(k) for k in path]
        for prefix, axis in partial_paths:
            plen = len(prefix)
            for i in range(len(keys) - plen + 1):
                if tuple(keys[i:i + plen]) == prefix:
                    return jax.lax.psum(g, axis)
        return g

    return jtu.tree_map_with_path(fix, grads)


def codebook_pspecs(model_or_state, model: nnx.Module | None = None):
    """PartitionSpec pytree for an nnx state: per-code leaves of code_axis
    codebooks get their row dim sharded over the axis; everything else is
    replicated (P()).

    Call as `codebook_pspecs(model)` (splits internally) or
    `codebook_pspecs(state, model)` for a state whose paths embed the model's
    (e.g. a _TrainState holding model + optimizer — optimizer momenta for a
    learnable sharded codebook inherit the sharding because their paths
    contain the codebook path).
    """
    if model is None:
        assert isinstance(model_or_state, nnx.Module)
        model = model_or_state
        _, state = nnx.split(model)
    else:
        state = model_or_state

    books = find_sharded_codebooks(model)

    def spec_for(path, leaf) -> P:
        keys = [_key_str(k) for k in path]
        for cb_path, cb in books:
            leaves = cb._code_sharded_leaves
            plen = len(cb_path)
            for i in range(len(keys) - plen):
                if tuple(keys[i:i + plen]) != cb_path:
                    continue
                nxt = keys[i + plen] if i + plen < len(keys) else None
                if nxt in leaves:
                    ndim = jnp.ndim(leaf)
                    pos = ndim - leaves[nxt]
                    spec = [None] * ndim
                    if 0 <= pos < ndim:
                        spec[pos] = cb.code_axis
                    return P(*spec)
        return P()

    return jtu.tree_map_with_path(spec_for, state)


class TensorParallelTrainer:
    """shard_map trainer for models containing `code_axis` codebooks, over a
    mesh with a data axis and a code axis (either may be size 1).

    Model/optimizer state is replicated EXCEPT the per-code codebook leaves,
    which shard over `code_axis`; the global batch shards over `data_axis`.
    Parameter gradients are pmean'd over data (codebook-row grads and EMA
    stats stay per-shard — each shard owns its rows).

    Usage:
        mesh = make_mesh(('data', 'code'), shape=(2, 4))
        vq    = VectorQuantize(dim, 65536, code_axis='code',
                               sync_axis='data', rngs=...)
        trainer = TensorParallelTrainer(model, optax.adamw(1e-3), loss_fn, mesh)
        loss = trainer.step(global_batch)
    """

    def __init__(
        self,
        model: nnx.Module,
        tx,
        loss_fn: Callable,
        mesh: Mesh,
        data_axis: str = 'data',
        batch_spec: P | None = None,
    ):
        self.model = model
        self.loss_fn = loss_fn
        self.mesh = mesh
        self.data_axis = data_axis
        self.batch_spec = batch_spec if batch_spec is not None else P(data_axis)

        optimizer = nnx.Optimizer(model, tx, wrt=nnx.Param)

        class _TrainState(nnx.Module):
            def __init__(self, model, optimizer):
                self.model = model
                self.optimizer = optimizer

        self._ts = _TrainState(model, optimizer)
        self._graphdef, state = nnx.split(self._ts)
        self._state_specs = codebook_pspecs(state, model)
        self._partial_grad_paths = find_code_partial_grad_paths(model)
        self._jitted = None

    def _build(self):
        graphdef = self._graphdef
        loss_fn = self.loss_fn
        data_axis = self.data_axis
        partial_paths = self._partial_grad_paths

        def body(state, batch):
            ts = nnx.merge(graphdef, state)
            loss, grads = nnx.value_and_grad(
                lambda m: loss_fn(m, batch)
            )(ts.model)
            grads = jax.lax.pmean(grads, data_axis)
            # replicated params with per-code-shard partial grads (e.g.
            # SimVQ's row-wise transform) accumulate over the code axis
            grads = psum_partial_grads(grads, partial_paths)
            loss = jax.lax.pmean(loss, data_axis)
            ts.optimizer.update(ts.model, grads)
            _, new_state = nnx.split(ts)
            return new_state, loss

        mapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(self._state_specs, self.batch_spec),
            out_specs=(self._state_specs, P()),
            check_vma=False,
        )
        return jax.jit(mapped)

    def step(self, batch) -> jax.Array:
        if self._jitted is None:
            self._jitted = self._build()
        _, state = nnx.split(self._ts)
        new_state, loss = self._jitted(state, batch)
        nnx.update(self._ts, new_state)
        return loss


# jitted shard_map bodies, keyed so repeated tp_apply calls in an eval/decode
# loop hit the jit cache instead of rebuilding (and fully retracing) a fresh
# closure per call (r2 advisor finding: full recompilation per step)
_TP_APPLY_CACHE: dict = {}
_TP_APPLY_CACHE_MAX = 64


def _tp_cache_put(key, mapped):
    if len(_TP_APPLY_CACHE) >= _TP_APPLY_CACHE_MAX:  # FIFO bound, no leak
        _TP_APPLY_CACHE.pop(next(iter(_TP_APPLY_CACHE)))
    _TP_APPLY_CACHE[key] = mapped


def _hashable_specs(tree):
    leaves, treedef = jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, P)
    )
    return (treedef, tuple(leaves))


def tp_apply(
    model: nnx.Module,
    mesh: Mesh,
    fn: Callable,
    *args,
    in_specs=P(),
    out_specs=P(),
    mutates_state: bool = False,
):
    """Run `fn(model, *args)` inside a shard_map with the model's codebook
    leaves sharded over their code axes (e.g. eval forwards or
    `get_output_from_indices` decode against a row-sharded codebook).

    `in_specs`/`out_specs` describe `args`/outputs (single spec broadcasts).
    With `mutates_state=True` the model's state updates (EMA etc.) are
    written back after the call.

    The jitted mapped function is cached on (fn, graphdef, mesh, specs,
    mutates_state), so calling tp_apply in a loop compiles once; `fn` must be
    a stable callable (module-level function or functools.partial of one),
    not a fresh lambda per call, to benefit.
    """
    graphdef, state = nnx.split(model)
    specs = codebook_pspecs(state, model)

    n_args = len(args)
    if not isinstance(in_specs, tuple):
        in_specs = (in_specs,) * n_args

    key = (
        fn, graphdef, mesh, mutates_state,
        _hashable_specs(specs), _hashable_specs(in_specs),
        _hashable_specs(out_specs),
    )
    mapped = _TP_APPLY_CACHE.get(key)

    if mutates_state:
        if mapped is None:
            def body(state, *inner):
                m = nnx.merge(graphdef, state)
                out = fn(m, *inner)
                _, new_state = nnx.split(m)
                return new_state, out

            mapped = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(specs, *in_specs),
                out_specs=(specs, out_specs),
                check_vma=False,
            ))
            _tp_cache_put(key, mapped)
        new_state, out = mapped(state, *args)
        nnx.update(model, new_state)
        return out

    if mapped is None:
        def body(state, *inner):
            m = nnx.merge(graphdef, state)
            return fn(m, *inner)

        mapped = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, *in_specs),
            out_specs=out_specs,
            check_vma=False,
        ))
        _tp_cache_put(key, mapped)
    return mapped(state, *args)
