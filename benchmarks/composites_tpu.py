"""TPU throughput of composite quantizers (eval forward), recorded in
BASELINE.md. Run on the default (TPU) backend."""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.utils import timeit_chained


def bench(name, module, x, passes_floor_ms, lo=8, hi=72):
    module.eval()
    graphdef, state = nnx.split(module)

    def fwd(z, x, state):
        # perturb the (small) float state leaves, NOT x: adding the carry to
        # a 0.5GB input costs an extra full HBM pass and inflates the number
        state = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a,
            state,
        )
        m = nnx.merge(graphdef, state)
        out = m(x)
        return jax.tree.leaves(out)[:2]

    t = timeit_chained(fwd, jnp.float32(0), x, state, lo=lo, hi=hi)
    n = x.shape[0] * x.shape[1]
    if t <= 5e-5:
        print(f'{name:28s}: <0.05 ms (below tunnel timing resolution)')
        return
    print(f'{name:28s}: {t*1e3:7.3f} ms  {n/t/1e6:6.1f} Mtok/s'
          + (f'  (floor {passes_floor_ms:.3f} ms -> '
             f'{passes_floor_ms/(t*1e3)*100:.0f}%)' if passes_floor_ms else ''))


def main():
    rngs = lambda s: nnx.Rngs(s)
    key = jax.random.PRNGKey(0)
    peak = 197e12
    # 4 MXU passes per layer: 1 bf16 selection + 3 for the bit-exact
    # one-hot lookup (see BASELINE.md)
    p = lambda n, c, d, layers=1: layers * 4 * 2 * n * c * d / peak * 1e3

    n_big = 256 * 2048                                   # 524k tokens
    x_big = jax.random.normal(key, (256, 2048, 256))
    bench('VectorQuantize c=512',
          vqtpu.VectorQuantize(dim=256, codebook_size=512, rngs=rngs(0)),
          x_big, p(n_big, 512, 256), lo=2, hi=16)
    bench('SimVQ c=512',
          vqtpu.SimVQ(dim=256, codebook_size=512, rngs=rngs(0)),
          x_big, p(n_big, 512, 256), lo=2, hi=16)

    n_mid = 32 * 2048                                    # 65k tokens
    x_mid = jax.random.normal(key, (32, 2048, 256))
    bench('ResidualVQ q=8 c=1024',
          vqtpu.ResidualVQ(dim=256, num_quantizers=8, codebook_size=1024,
                           rngs=rngs(0)), x_mid,
          p(n_mid, 1024, 256, layers=8), lo=2, hi=12)
    bench('GroupedResidualVQ g=2 q=4',
          vqtpu.GroupedResidualVQ(dim=256, groups=2, num_quantizers=4,
                                  codebook_size=1024, rngs=rngs(0)),
          x_mid, p(n_mid, 1024, 128, layers=8), lo=2, hi=12)

    bench('FSQ levels=8x[8,5..5]',
          vqtpu.FSQ(levels=[8, 5, 5, 5, 5, 5, 5, 5], rngs=rngs(0)),
          jax.random.normal(key, (256, 2048, 8)), 0, lo=16, hi=144)
    bench('LFQ 2^16',
          vqtpu.LFQ(codebook_size=2 ** 16, dim=16, rngs=rngs(0)),
          jax.random.normal(key, (256, 2048, 16)), 0, lo=16, hi=144)


if __name__ == '__main__':
    main()
