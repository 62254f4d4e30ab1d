"""Group-parallel GroupedResidualVQ: groups sharded over a mesh axis.

GroupedResidualVQ runs its feature-dim groups as a serial loop over
independent members (reference residual_vq.py:634-724). On a mesh the
groups are embarrassingly parallel — `group_parallel_forward` runs each
group's member on its own device(s) with identical semantics (indices
exact vs the serial loop; EMA codebook state updates written back).

This example EMA-trains a GroupedResidualVQ on synthetic features with
the groups sharded over all available devices, checks the first step
against the serial loop, and round-trips the codes through the sharded
decode path. Run on any host (uses a virtual CPU mesh when no multi-chip
TPU is attached):

    python examples/group_parallel_grvq.py --steps 20

Note: `group_parallel_forward` executes eagerly (the inner shard_map step
is jitted and cached); call it OUTSIDE any enclosing jax.jit/grad when
update_state=True — the EMA writeback must see concrete arrays. For pure
serving, pass update_state=False (traceable anywhere).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax


def main(steps=20, groups=4, dim=64, num_quantizers=4, codes=128,
         tokens=2048, seed=0):
    try:
        # virtual CPU mesh for the demo — only possible before the backend
        # initializes; on a 1-chip TPU the mesh is 1 device with all
        # groups local (g_local = groups), which runs the same code path
        jax.config.update('jax_num_cpu_devices', groups)
    except RuntimeError:
        pass

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx
    from jax.sharding import Mesh

    from vqtpu import GroupedResidualVQ
    from vqtpu.parallel import (
        group_parallel_forward, group_parallel_output_from_indices,
    )

    n_dev = min(groups, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ('group',))
    print(f'{groups} groups over a {n_dev}-device group mesh '
          f'({jax.default_backend()})')

    kw = dict(dim=dim, groups=groups, num_quantizers=num_quantizers,
              codebook_size=codes, decay=0.9)
    gp = GroupedResidualVQ(rngs=nnx.Rngs(seed), **kw)
    serial = GroupedResidualVQ(rngs=nnx.Rngs(seed), **kw)
    gp.train(), serial.train()

    key = jax.random.PRNGKey(seed)
    centers = jax.random.normal(key, (16, dim)) * 2.0

    def batch(i):
        k = jax.random.fold_in(key, i)
        pick = jax.random.randint(k, (1, tokens), 0, 16)
        noise = jax.random.normal(jax.random.fold_in(k, 1), (1, tokens, dim))
        return jnp.take(centers, pick, axis=0) + 0.1 * noise

    # first step: group-parallel == the serial Python loop
    x0 = batch(0)
    _, ind_gp, loss_gp = group_parallel_forward(gp, x0, mesh)
    _, ind_s, loss_s = serial(x0)
    assert (np.asarray(ind_gp) == np.asarray(ind_s)).all(), 'indices diverged'
    print(f'step 0: indices match serial loop; '
          f'commit loss {float(loss_gp.sum()):.4f}')

    for i in range(1, steps):
        quantized, indices, losses = group_parallel_forward(gp, batch(i), mesh)
        if i % 5 == 0 or i == steps - 1:
            rec = float(jnp.abs(quantized - batch(i)).mean())
            print(f'step {i:3d}: commit {float(losses.sum()):.4f} '
                  f'| recon l1 {rec:.4f}')

    # serving decode: each device decodes its group from its own codebooks
    gp.eval()
    x = batch(steps)
    quantized, indices, _ = group_parallel_forward(
        gp, x, mesh, update_state=False
    )
    decoded = group_parallel_output_from_indices(gp, indices, mesh)
    err = float(jnp.abs(decoded - quantized).max())
    print(f'sharded decode round-trip max err {err:.2e}')
    assert err < 1e-5


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--groups', type=int, default=4)
    ap.add_argument('--dim', type=int, default=64)
    ap.add_argument('--quantizers', type=int, default=4)
    ap.add_argument('--codes', type=int, default=128)
    a = ap.parse_args()
    main(steps=a.steps, groups=a.groups, dim=a.dim,
         num_quantizers=a.quantizers, codes=a.codes)
