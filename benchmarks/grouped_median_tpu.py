"""Median-of-5 idle-host capture of the GroupedResidualVQ composite
forward (VERDICT r4 #9): turns the round-4 78-87% single-reading band into
a tight median claim. Same shape/config as composites_tpu.py /
grouped_regate_tpu.py (65k tokens, g=2, q=4, c=1024, d=128/group), auto
selection policy (the shipped gate).

Run on the default (TPU) backend with the host otherwise idle.
"""
import statistics
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.utils import timeit_chained

D, C, G, TOKENS = 128, 1024, 2, 65536


def main():
    grvq = vqtpu.GroupedResidualVQ(dim=G * D, groups=G, num_quantizers=4,
                                   codebook_size=C, rngs=nnx.Rngs(0))
    grvq.eval()
    gdef, state = nnx.split(grvq)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 2048, G * D))

    def fwd(z, x, state):
        state = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(gdef, state)
        return jax.tree.leaves(m(x))[:2]

    floor = 8 * 4 * (2 * TOKENS * C * D / 197e12) * 1e3   # 8 layer-passes
    reads = []
    for i in range(5):
        t = timeit_chained(fwd, jnp.float32(0), x, state, lo=2, hi=12) * 1e3
        reads.append(t)
        print(f'read {i + 1}: {t:7.3f} ms ({floor / t * 100:4.1f}% of floor)')
    med = statistics.median(reads)
    print(f'GroupedRVQ median-of-5: {med:.3f} ms '
          f'[{min(reads):.3f}, {max(reads):.3f}] '
          f'-> {floor / med * 100:.1f}% of {floor:.3f} ms floor '
          f'[{floor / max(reads) * 100:.1f}, {floor / min(reads) * 100:.1f}]')


if __name__ == '__main__':
    main()
