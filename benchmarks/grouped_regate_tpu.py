"""GroupedResidualVQ composite with the selection auto-gate overridden.

Round-4 decision bench (VERDICT r3 item 3 tail): grouped_shape_tpu.py
measured the pipelined Pallas kernel at bn=2048 BEATING XLA standalone at
the composite shape (0.185 vs 0.254 ms; n=65536, c=1024, d=128) — below
the r2 n >= 2^18 auto-gate, which was set when Pallas-at-composite-scale
REGRESSED the full module (4.45 -> 6.54 ms, bn=4096). This bench decides
whether that regression was the kernel (still there at bn=2048) or the r2
block size: it measures the FULL GroupedResidualVQ eval forward with
selection forced through Pallas at each candidate block size, against the
current auto policy.

Decision rule: if a forced block size beats auto by >5% end-to-end, lower
the n-gate for that (c, d, bn) envelope; otherwise certify the n-gate as
final (XLA graph fusion wins at composite scale despite losing standalone).

Run on the TPU backend: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/grouped_regate_tpu.py
"""

import functools
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
import vqtpu.kernels.distance as dist
import vqtpu.codebook.codebook as cbmod
from vqtpu.utils import timeit_chained

D, C, G = 128, 1024, 2
TOKENS = 65536


def measure_grouped():
    grvq = vqtpu.GroupedResidualVQ(dim=2 * D, groups=G, num_quantizers=4,
                                   codebook_size=C, rngs=nnx.Rngs(0))
    grvq.eval()
    gdef, state = nnx.split(grvq)
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 2048, 2 * D))

    def fwd(acc, x, state):
        state = jax.tree.map(
            lambda a: a + acc * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(gdef, state)
        q, ind, loss = m(x)
        return (acc + q.sum() * 1e-12
                + ind.sum().astype(jnp.float32) * 1e-12 + loss.sum() * 0)

    return timeit_chained(fwd, jnp.float32(0), x, state, lo=2, hi=12)


def main():
    orig = dist.nearest_code
    floor = 8 * 4 * (2 * TOKENS * C * D / 197e12) * 1e3

    t = measure_grouped() * 1e3
    print(f'GroupedRVQ auto (XLA gate): {t:7.3f} ms '
          f'({floor / t * 100:3.0f}% of {floor:.3f} ms floor)')

    for bn in (1024, 2048):
        def forced(x, embed, metric='euclidean', **kw):
            kw.pop('backend', None)
            kw.pop('block_n', None)
            return orig(x, embed, metric, backend='pallas',
                        block_n=bn, **kw)

        dist.nearest_code = forced
        cbmod.nearest_code = forced
        try:
            t = measure_grouped() * 1e3
            print(f'GroupedRVQ Pallas bn={bn:4d}: {t:7.3f} ms '
                  f'({floor / t * 100:3.0f}% of floor)')
        except Exception as e:
            print(f'GroupedRVQ Pallas bn={bn:4d}: FAILED '
                  f'({type(e).__name__}: {str(e).splitlines()[0][:60]})')
        finally:
            dist.nearest_code = orig
            cbmod.nearest_code = orig


if __name__ == '__main__':
    main()
