"""Serving decode path (indices -> vectors, the token-LM hot path) across
codebook sizes and precision tiers.

Measurement note: indices must depend on the loop carry — with
loop-invariant indices XLA hoists the one-hot construction (and apparently
gather preparation), fabricating flat-in-c gather times at c=65536 that a
real serving stream never sees.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/decode_tpu.py
"""

import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from vqtpu.kernels.distance import gather_codes
from bench import detect_specs

N, D = 1 << 20, 256


@functools.partial(jax.jit, static_argnums=2)
def _chained(idx, embed, iters):
    def body(i, acc):
        ii = idx + (acc * 0).astype(jnp.int32)     # carry-dependent indices
        q = gather_codes(embed, ii)
        return (acc + q.sum().astype(jnp.float32) * 1e-12
                + ii.sum().astype(jnp.float32) * 1e-12)
    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))


def _measure(idx, embed, lo=4, hi=52):
    float(_chained(idx, embed, lo))
    float(_chained(idx, embed, hi))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter(); float(_chained(idx, embed, lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(_chained(idx, embed, hi))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (hi - lo))
    return sorted(slopes)[len(slopes) // 2]


def main():
    peak, hbm = detect_specs()
    for c in (512, 2048, 65536):
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, c)
        embed = jax.random.normal(jax.random.PRNGKey(0), (c, D), jnp.float32)
        t = _measure(idx, embed)
        print(f'c={c:6d} exact f32: {t*1e3:7.3f} ms  {N/t/1e6:6.0f} Mtok/s',
              flush=True)
        t = _measure(idx, embed.astype(jnp.bfloat16))
        print(f'c={c:6d} bf16     : {t*1e3:7.3f} ms  {N/t/1e6:6.0f} Mtok/s',
              flush=True)


if __name__ == '__main__':
    main()
