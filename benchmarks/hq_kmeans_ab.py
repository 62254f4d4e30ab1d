"""Probe: does the always-traced kmeans-init lax.cond cost eval time?

The zoo HierarchicalVQ row (kmeans_init=True default) measured 1.0-1.24 ms
while the NHWC-probe module baseline (kmeans_init=False) measured 0.873 —
if real, every kmeans_init=True quantizer pays an eval tax for a branch
that can never fire after init. 3 readings each, same harness.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/hq_kmeans_ab.py
"""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.utils import timeit_chained

SCALES, B, D, C, RES = (4, 8, 16, 32), 16, 256, 512, 32


def measure(kmeans_init: bool, reads: int = 3):
    hq = vqtpu.HierarchicalVQ(dim=D, codebook_size=C, scales=SCALES,
                              accept_image_fmap=True,
                              kmeans_init=kmeans_init, rngs=nnx.Rngs(0))
    hq.eval()
    gdef, state = nnx.split(hq)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, RES, RES))

    def fwd(z, x, state):
        state = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(gdef, state)
        recon, inds, loss = m(x)
        return recon, inds[-1]

    ts = [timeit_chained(fwd, jnp.float32(0), x, state, lo=4, hi=24) * 1e3
          for _ in range(reads)]
    ts.sort()
    print(f'kmeans_init={kmeans_init!s:5}: {ts[len(ts)//2]:7.3f} ms median '
          f'of {reads} [{ts[0]:.3f}, {ts[-1]:.3f}]')
    return ts[len(ts) // 2]


def main():
    t_on = measure(True)
    t_off = measure(False)
    print(f'eval tax of the kmeans cond: {t_on - t_off:+.3f} ms '
          f'({(t_on / t_off - 1) * 100:+.1f}%)')


if __name__ == '__main__':
    main()
