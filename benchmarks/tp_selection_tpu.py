"""Sharded-selection path cost on the real chip (VERDICT r1 #1 bench item).

Only one physical chip is available, so this measures what CAN be measured
honestly on real silicon: the row-sharded selection code path
(`sharded_nearest_code` inside shard_map — local fused kernel + score
recompute + (score, index) reduction) on a 1-device 'code' mesh, against
plain single-device selection at the same codebook size. The delta is the
TP machinery's overhead at world=1; the cross-shard all_gather cost at
world>1 is O(n * world) floats over ICI and is exercised (for correctness
and shape) on the 8-device CPU mesh in tests/test_tp.py.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/tp_selection_tpu.py
"""

import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from vqtpu.kernels.distance import nearest_code_xla
from vqtpu.parallel.shard import sharded_nearest_code
from vqtpu.utils import timeit_chained
from bench import detect_specs


def main():
    peak, hbm = detect_specs()
    mesh = Mesh(np.array(jax.devices()[:1]), ('code',))

    for n, c, d in ((1 << 17, 65536, 256), (1 << 20, 4096, 256)):
        x = jax.random.normal(jax.random.PRNGKey(2), (n, d), jnp.float32)
        e = jax.random.normal(jax.random.PRNGKey(0), (c, d), jnp.float32)
        floor = 2.0 * n * c * d / (peak * 1e12)

        def plain(x, e):
            return nearest_code_xla(x, e)

        sharded = jax.shard_map(
            lambda xx, ee: sharded_nearest_code(xx, ee, 'code'),
            mesh=mesh, in_specs=(P(), P('code')), out_specs=P(),
            check_vma=False,
        )

        t_p = timeit_chained(plain, x, e, perturb_arg=1, lo=2, hi=8)
        t_s = timeit_chained(sharded, x, e, perturb_arg=1, lo=2, hi=8)
        idx_p = plain(x[:4096], e)
        idx_s = jax.jit(sharded)(x[:4096], e)
        agree = float((idx_p == idx_s).mean())
        print(
            f'n={n} c={c}: plain {t_p*1e3:8.2f}ms ({100*floor/t_p:5.1f}%)  '
            f'sharded-path(world=1) {t_s*1e3:8.2f}ms ({100*floor/t_s:5.1f}%)  '
            f'overhead {100*(t_s/t_p-1):+.1f}%  agree={agree:.5f}',
            flush=True,
        )


if __name__ == '__main__':
    main()
