"""Multi-process (multi-host) execution support.

The reference relies on the caller's DDP launcher to create the process
group and only guards its collectives with `is_distributed()`
(vector_quantize_pytorch.py:334-336). The TPU-native equivalent: one
`jax.distributed.initialize` call per process, after which every device in
the job is visible and a single global `Mesh` spans hosts — the SAME
psum/shard_map training code then runs unchanged, with collectives riding
ICI within a slice and DCN across hosts.

Tested by tests/test_multiprocess.py: 2 CPU processes x 4 devices each run
the data-parallel train step and must end with bit-identical codebooks.
"""

from __future__ import annotations

import jax
import numpy as np


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-process job.

    On TPU pod slices all arguments are autodetected from the environment —
    call `init_multihost()` with no args before any other JAX API. On CPU/GPU
    (or for tests) pass the coordinator address ('host:port' of process 0),
    the process count and this process's id.

    After this returns, `jax.devices()` lists every device in the job while
    `jax.local_devices()` lists this host's; build one global Mesh over
    `jax.devices()` and train exactly as in the single-host case.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch(mesh, spec, full_array) -> jax.Array:
    """Build a globally-sharded device array from a (replicated, host-level)
    numpy batch: every process calls this with the SAME `full_array` (e.g.
    generated from a shared seed) and contributes only its addressable
    shards. The result is a global jax.Array laid out per `spec` over
    `mesh`, usable directly by shard_map'd train steps in multi-process
    jobs (single-process: equivalent to device_put with the sharding)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    full_array = np.asarray(full_array)
    return jax.make_array_from_callback(
        full_array.shape, sharding, lambda idx: full_array[idx]
    )
