"""Hot-path throughput across codebook/model shapes (eval select+lookup,
exact pipeline), recorded in BASELINE.md. Run on the TPU backend."""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from vqtpu.kernels.distance import quantize_lookup
from bench import chained_seconds_per_iter

N = 1024 * 1024
PEAK, HBM = 197e12, 819e9


def floor_ms(c, d):
    """Structural floor of the exact pipeline: selection is 1 MXU pass; the
    lookup is whichever exact formulation is cheaper — the 3-pass one-hot
    matmul (linear in c) or the memory-floor row gather (flat in c). Round 1
    assumed 4 MXU passes everywhere, which stops being a floor once take
    wins (c > ~512)."""
    select = 2 * N * c * d / PEAK
    lookup_onehot = 3 * 2 * N * c * d / PEAK
    lookup_gather = (N * d * 4 * 2 + N * 4) / HBM
    compute = select + min(lookup_onehot, lookup_gather)
    memory = (N * d * 4 * 2 + N * 4 + c * d * 4) / HBM
    return max(compute, memory) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f'{"c":>6} {"d":>5} {"ms":>8} {"Mtok/s":>8} {"floor ms":>9} {"%":>5}')
    for c in (256, 512, 1024, 2048):
        for d in (128, 256, 512):
            x = jax.random.normal(key, (N, d), jnp.float32)
            e = jax.random.normal(jax.random.PRNGKey(1), (c, d), jnp.float32)
            # bench.py harness: median of 5 slopes over a wide gap (single
            # slopes over the tunnel mismeasure by up to 30%)
            t = chained_seconds_per_iter(quantize_lookup, x, e) * 1e3
            f = floor_ms(c, d)
            print(f'{c:>6} {d:>5} {t:>8.3f} {N/t/1e3:>8.0f} {f:>9.3f} '
                  f'{f/t*100:>4.0f}%')


if __name__ == '__main__':
    main()
