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


def _build_sharded_chained(mesh, iters):
    """Chained-slope loop with the decode routed through
    sharded_gather_codes under shard_map (world = mesh size). At world=1 the
    delta vs the plain path is the pure sharding overhead (one-hot matmul
    replacing the take + a 1-device psum) — the measured answer to
    BASELINE's 'row-sharded codebook is the scalable serving answer' claim."""
    from jax.sharding import PartitionSpec as P
    from vqtpu.parallel.shard import sharded_gather_codes

    def inner(idx, embed):
        def body(i, acc):
            ii = idx + (acc * 0).astype(jnp.int32)
            q = sharded_gather_codes(embed, ii, 'code')
            return (acc + q.sum().astype(jnp.float32) * 1e-12
                    + ii.sum().astype(jnp.float32) * 1e-12)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return jax.jit(jax.shard_map(
        inner, mesh=mesh, in_specs=(P(), P('code')), out_specs=P(),
        check_vma=False,
    ))


def _measure_sharded(idx, embed, world, lo=4, hi=52):
    import numpy as np
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:world]).reshape(world), ('code',))
    f_lo = _build_sharded_chained(mesh, lo)
    f_hi = _build_sharded_chained(mesh, hi)
    float(f_lo(idx, embed))
    float(f_hi(idx, embed))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter(); float(f_lo(idx, embed))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f_hi(idx, embed))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (hi - lo))
    return sorted(slopes)[len(slopes) // 2]


def main():
    peak, hbm = detect_specs()
    sharded = '--sharded' in sys.argv
    world = len(jax.devices()) if '--world-all' in sys.argv else 1
    for c in (512, 2048, 65536):
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, c)
        embed = jax.random.normal(jax.random.PRNGKey(0), (c, D), jnp.float32)
        t = _measure(idx, embed)
        print(f'c={c:6d} exact f32: {t*1e3:7.3f} ms  {N/t/1e6:6.0f} Mtok/s',
              flush=True)
        if sharded:
            ts = _measure_sharded(idx, embed, world)
            print(f'c={c:6d} sharded@{world}: {ts*1e3:7.3f} ms  '
                  f'{N/ts/1e6:6.0f} Mtok/s  overhead {100*(ts/t-1):+5.1f}%',
                  flush=True)
        t = _measure(idx, embed.astype(jnp.bfloat16))
        print(f'c={c:6d} bf16     : {t*1e3:7.3f} ms  {N/t/1e6:6.0f} Mtok/s',
              flush=True)


if __name__ == '__main__':
    main()
