"""Checkpoint / resume for quantizer and model state.

The reference has no checkpoint subsystem — state rides nn.Module
`state_dict()` through registered buffers (SURVEY.md §5.4; the reference's
tests/test_beam.py:19 relies on `load_state_dict` round-tripping). Here the
equivalent surface is explicit:

  - `state_dict(module)` / `load_state_dict(module, d)` — pure nested-dict
    snapshots (numpy leaves), torch-state_dict-shaped, for in-process
    round-trips and cross-framework weight injection.
  - `save_checkpoint(path, module)` / `restore_checkpoint(path, module)` —
    on-disk persistence via orbax (async-safe, multi-host aware).

What is PERSISTENT vs DERIVED (mirrors the reference's buffer persistence
semantics, vector_quantize_pytorch.py:415-448):

  persistent: Codebook {embed, embed_avg, cluster_size, initted,
              accum_cluster_size, accum_embed_avg, affine batch/codebook
              mean+variance and their _initted flags}; all nnx.Param leaves
              (projections, SimVQ transform, LatentQuantize values, QINCo
              MLPs, HierarchicalVQ Phi convs); SimVQ's frozen codebook.
  derived (recomputed at construction, never checkpointed): FSQ/LFQ/
              ResidualFSQ implicit codebooks, mixed-radix bases, bit masks,
              per-layer scale schedules — these live as Python constants
              inside the traced functions, so there is nothing to persist.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

DERIVED_STATE_DOC = __doc__


# RNG key leaves are not persisted (same stance as torch state_dict: RNG
# state belongs to the program, not the checkpoint); a freshly-constructed
# module supplies its own keys.
_PERSISTED = nnx.Not(nnx.RngState)


def state_dict(module: nnx.Module) -> dict:
    """Pure nested dict (numpy leaves) of all stateful leaves of `module`."""
    st = nnx.state(module, _PERSISTED)
    pure = nnx.to_pure_dict(st) if hasattr(nnx, 'to_pure_dict') else st.to_pure_dict()
    return jax.tree.map(lambda x: np.asarray(x), pure)


def load_state_dict(module: nnx.Module, d: dict) -> nnx.Module:
    """Inverse of `state_dict`: writes leaves back into `module` in place."""
    # leaves must be jax arrays: numpy views of jax buffers are read-only,
    # which breaks subsequent indexed EMA updates on the variables
    d = jax.tree.map(jnp.asarray, d)
    st = nnx.state(module, _PERSISTED)
    if hasattr(nnx, 'replace_by_pure_dict'):
        nnx.replace_by_pure_dict(st, d)
    else:
        st.replace_by_pure_dict(d)
    nnx.update(module, st)
    return module


def save_checkpoint(path: str | os.PathLike, module: nnx.Module) -> None:
    """Persist `module` state to `path` (a directory) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, nnx.state(module, _PERSISTED))


def restore_checkpoint(path: str | os.PathLike, module: nnx.Module) -> nnx.Module:
    """Restore state saved by `save_checkpoint` into `module` (in place).

    `module` must be freshly constructed with the same config — its current
    state provides the target structure/shardings for orbax.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.fspath(path))
    target = nnx.state(module, _PERSISTED)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    nnx.update(module, restored)
    return module
