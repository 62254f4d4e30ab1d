"""Child program for tests/test_multiprocess.py: one process of a
2-process x 4-device CPU job running the data-parallel VQ train step —
or, in 'tp' mode, the full 2D (data x code) tensor-parallel train step
with the data axis crossing the PROCESS boundary (the DCN stand-in) and
the codebook rows sharded over each process's local devices.

Prints one JSON line: {"process_id", "losses", "codebook_b64"} where
codebook_b64 is the raw f32 bytes of this process's assembled view of the
codebook after training — the parent asserts the processes agree
bit-identically (and, for 'dp', match a single-process run).

Run (from the parent): python tests/_mp_child.py <proc_id> <nproc> <port> [mode]
With nproc=1 it runs the identical job single-process (8 local devices).
"""

import base64
import json
import sys


def main():
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else 'dp'

    import jax

    jax.config.update('jax_platforms', 'cpu')
    local_devices = 8 // nproc
    jax.config.update('jax_num_cpu_devices', local_devices)

    sys.path.insert(0, '/root/repo')
    from vqtpu.parallel import init_multihost

    if nproc > 1:
        init_multihost(
            coordinator_address=f'127.0.0.1:{port}',
            num_processes=nproc,
            process_id=proc_id,
        )
        assert jax.process_count() == nproc
        assert len(jax.devices()) == 8

    import numpy as np
    import optax
    from flax import nnx

    from vqtpu import VectorQuantize
    from vqtpu.parallel import (
        DataParallelTrainer, TensorParallelTrainer, global_batch, make_mesh,
    )
    from jax.sharding import PartitionSpec as P

    if mode == 'group':
        _run_group_mode(proc_id, nproc)
        return
    if mode == 'lfq':
        _run_lfq_mode(proc_id, nproc)
        return

    tp = mode == 'tp'

    class Model(nnx.Module):
        def __init__(self, rngs):
            self.enc = nnx.Linear(8, 16, rngs=rngs)
            self.vq = VectorQuantize(
                dim=16, codebook_size=32, sync_axis='data',
                code_axis='code' if tp else None,
                kmeans_init=True, kmeans_iters=3,
                threshold_ema_dead_code=0.5, rngs=rngs,
            )
            self.dec = nnx.Linear(16, 8, rngs=rngs)

        def __call__(self, x):
            q, _, commit = self.vq(self.enc(x))
            return self.dec(q), commit

    def loss_fn(model, batch):
        out, commit = model(batch)
        return ((out - batch) ** 2).mean() + commit

    model = Model(nnx.Rngs(0))
    if tp:
        # data axis crosses the process boundary; codebook rows shard over
        # each process's local devices
        mesh = make_mesh(('data', 'code'), shape=(nproc, 8 // nproc))
        trainer = TensorParallelTrainer(model, optax.adam(1e-2), loss_fn, mesh)
    else:
        mesh = make_mesh(('data',))
        trainer = DataParallelTrainer(model, optax.adam(1e-2), loss_fn, mesh)

    losses = []
    for step in range(3):
        # shared-seed global batch; each process contributes its local shards
        full = np.random.RandomState(100 + step).randn(32, 4, 8).astype('float32')
        batch = global_batch(mesh, P('data'), full)
        losses.append(float(trainer.step(batch)))

    embed = model.vq._codebook.embed[...]
    # assemble this process's full logical view from its addressable shards
    # (dp: one replicated shard; tp: this data-row's code shards)
    full_cb = np.zeros(embed.shape, np.float32)
    for s in embed.addressable_shards:
        full_cb[s.index] = np.asarray(s.data)
    print(json.dumps({
        'process_id': proc_id,
        'losses': losses,
        'codebook_b64': base64.b64encode(full_cb.tobytes()).decode(),
        'shape': list(full_cb.shape),
    }))


def _run_group_mode(proc_id: int, nproc: int):
    """Group-axis (EP-style) GroupedResidualVQ with the `group` mesh axis
    CROSSING the process boundary (groups 0-3 on proc 0, 4-7 on proc 1).
    Fingerprint = per-step train losses + a post-training eval probe
    (sum of quantized / indices), all replicated global scalars — the
    parent asserts cross-process bit-identity and parity with the
    identical single-process job."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from vqtpu import GroupedResidualVQ
    from vqtpu.parallel import group_parallel_forward, make_mesh

    mesh = make_mesh(('group',), shape=(8,))
    module = GroupedResidualVQ(
        dim=32, groups=8, num_quantizers=2, codebook_size=32,
        rngs=nnx.Rngs(0),
    )

    losses = []
    for step in range(3):
        x = jnp.asarray(
            np.random.RandomState(300 + step).randn(2, 16, 32), jnp.float32
        )
        q, ind, loss = group_parallel_forward(module, x, mesh)
        losses.append(float(jnp.sum(loss)))          # (g, q) -> replicated

    module.eval()
    xp = jnp.asarray(np.random.RandomState(999).randn(2, 16, 32), jnp.float32)
    q, ind, _ = group_parallel_forward(module, xp, mesh, update_state=False)
    probe = [
        float(jnp.sum(q)),
        int(jnp.sum(ind.astype(jnp.int64) * (1 + jnp.arange(ind.size,
            dtype=jnp.int64).reshape(ind.shape) % 97))),
    ]
    print(json.dumps({
        'process_id': proc_id, 'losses': losses, 'probe': probe,
        'codebook_b64': '',
    }))


def _run_lfq_mode(proc_id: int, nproc: int):
    """LFQ with the fused Pallas entropy sweeps (interpret mode on CPU)
    inside the data-parallel train step, `data` axis crossing the process
    boundary: the differentiable avg_prob psum (reference
    lookup_free_quantization.py:33-43,396) must compose with jax.distributed.
    Fingerprint = per-step total losses (replicated scalars)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import nnx

    from vqtpu import LFQ
    from vqtpu.parallel import DataParallelTrainer, global_batch, make_mesh
    from jax.sharding import PartitionSpec as P

    class Model(nnx.Module):
        def __init__(self, rngs):
            self.enc = nnx.Linear(8, 8, rngs=rngs)
            self.lfq = LFQ(codebook_size=256, dim=8, entropy_chunk_size=64,
                           entropy_fused='on', sync_axis='data', rngs=rngs)
            self.dec = nnx.Linear(8, 8, rngs=rngs)

        def __call__(self, x):
            q, _, aux = self.lfq(self.enc(x))
            return self.dec(q), aux

    def loss_fn(model, batch):
        out, aux = model(batch)
        return ((out - batch) ** 2).mean() + aux

    mesh = make_mesh(('data',))
    model = Model(nnx.Rngs(0))
    trainer = DataParallelTrainer(model, optax.adam(1e-2), loss_fn, mesh)

    losses = []
    for step in range(3):
        full = np.random.RandomState(500 + step).randn(16, 4, 8).astype('float32')
        batch = global_batch(mesh, P('data'), full)
        losses.append(float(trainer.step(batch)))

    print(json.dumps({
        'process_id': proc_id, 'losses': losses, 'codebook_b64': '',
    }))


if __name__ == '__main__':
    main()
