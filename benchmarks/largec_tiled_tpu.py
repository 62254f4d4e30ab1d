"""Large-codebook selection: XLA fused matmul+argmax vs the restructured
tiled-codebook Pallas kernel (round-4 blocking sweep).

VERDICT r3 item 8 / BASELINE.md finding 3: the r2 tiled kernel
(block_n=1024, c_tile=1024) measured ~70% of the MXU floor at c=8192-65536
vs XLA's 85-87% — diagnosed as codebook re-streaming (the whole codebook
re-streams once per token block) with a per-tile compute:DMA ratio of only
~2:1. The r4 restructure inverts the tile aspect (block_n up to 4096,
c_tile down to 256-512): 4x fewer codebook re-streams at the same
scores-VMEM budget, compute:DMA ~8:1.

Decision rule (one attempt, then certify — CLAUDE.md dead-end discipline):
if the best tiled config beats XLA at c=8192-65536, flip the `nearest_code`
auto policy for large c; otherwise record the dead-end in BASELINE.md and
XLA stays final.

Run on the TPU backend: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/largec_tiled_tpu.py
"""

import functools
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from vqtpu.kernels.distance import (
    _nearest_code_tiled, nearest_code_xla, _auto_tile,
)
from bench import chained_seconds_per_iter

N = 256 * 1024
D = 256
PEAK = 197e12

# (block_n, c_tile): r2 shape, then the r4 inverted-aspect candidates
# (scores buffer constant at <=8MB; block_n=8192/c_tile=256 probes whether
# Mosaic still compiles one step beyond the auto policy's 4MB x-block cap)
CONFIGS = [(1024, 1024), (2048, 512), (2048, 1024), (4096, 256),
           (4096, 512), (8192, 256)]


def floor_ms(n, c, d):
    return 2 * n * c * d / PEAK * 1e3


def bench(fn, x, e):
    # selection returns int32 indices only; the harness expects (idx, q)
    # pairs — pad with a scalar zero (idx.sum() in the carry already
    # consumes the full selection output, so nothing can be sliced away)
    def wrapped(x, e):
        idx = fn(x, e)
        return idx, jnp.zeros((1,), jnp.float32)
    return chained_seconds_per_iter(wrapped, x, e, lo=2, hi=10) * 1e3


def main():
    key = jax.random.PRNGKey(0)
    print(f'{"c":>6} {"impl":>16} {"ms":>9} {"% floor":>8}')
    for c in (8192, 16384, 65536):
        x = jax.random.normal(key, (N, D), jnp.float32)
        e = jax.random.normal(jax.random.PRNGKey(1), (c, D), jnp.float32)
        f = floor_ms(N, c, D)

        t = bench(functools.partial(nearest_code_xla, metric='euclidean'),
                  x, e)
        print(f'{c:>6} {"xla":>16} {t:>9.3f} {f / t * 100:>7.0f}%')

        for bn, ct in CONFIGS:
            label = f'tiled {bn}x{ct}'
            try:
                t = bench(
                    functools.partial(
                        _nearest_code_tiled, metric='euclidean',
                        block_n=bn, c_tile=ct),
                    x, e)
                print(f'{c:>6} {label:>16} {t:>9.3f} {f / t * 100:>7.0f}%')
            except Exception as err:  # Mosaic compile failures are data
                msg = str(err).splitlines()[0][:60]
                print(f'{c:>6} {label:>16}   FAILED {msg}')
        abn, act = _auto_tile(N, D)
        print(f'{c:>6} auto policy = tiled {abn}x{act}')


if __name__ == '__main__':
    main()
