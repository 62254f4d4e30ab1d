"""World-1 overhead of the group-parallel path (single chip).

`group_parallel_forward` exists for multi-chip meshes; this measures what
the shard_map + state-stacking wrapper costs when the 'group' axis is one
real device (all groups local), vs the serial Python-loop forward — the
same world-1 evidence pattern as the sharded-decode/bf16-tier rows.

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/group_parallel_tpu.py
"""

import sys

sys.path.insert(0, '/root/repo')

import jax
import numpy as np
from flax import nnx
from jax.sharding import Mesh

from vqtpu.composite import GroupedResidualVQ
from vqtpu.parallel import group_parallel_forward
from vqtpu.utils import timeit_chained


def main(tokens=65536, dim=256, groups=2, q=4, c=1024, seed=0):
    kw = dict(dim=dim, groups=groups, num_quantizers=q, codebook_size=c)
    serial = GroupedResidualVQ(rngs=nnx.Rngs(0), **kw)
    par = GroupedResidualVQ(rngs=nnx.Rngs(0), **kw)
    serial.eval(), par.eval()
    mesh = Mesh(np.array(jax.devices()[:1]), ('group',))

    x = jax.random.normal(jax.random.PRNGKey(seed), (1, tokens, dim))

    # correctness first
    _, ind_s, _ = serial(x)
    _, ind_p, _ = group_parallel_forward(par, x, mesh)
    assert (np.asarray(ind_s) == np.asarray(ind_p)).all()

    graphdef, state = nnx.split(serial)

    @jax.jit
    def serial_fwd(state, x):
        m = nnx.merge(graphdef, state)
        quantized, ind, _ = m(x)
        return quantized.sum() + ind.sum()

    t_serial = timeit_chained(lambda a: serial_fwd(state, a), x)

    def par_fwd(a):
        quantized, ind, _ = group_parallel_forward(
            par, a, mesh, update_state=False
        )
        return quantized.sum() + ind.sum()

    t_par = timeit_chained(par_fwd, x)
    print(f'serial jit      {t_serial*1e3:8.2f} ms')
    print(f'group world-1   {t_par*1e3:8.2f} ms  '
          f'({(t_par/t_serial-1)*100:+.1f}%)')


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--tokens', type=int, default=65536)
    ap.add_argument('--groups', type=int, default=2)
    ap.add_argument('--q', type=int, default=4)
    ap.add_argument('--c', type=int, default=1024)
    a = ap.parse_args()
    main(tokens=a.tokens, groups=a.groups, q=a.q, c=a.c)
