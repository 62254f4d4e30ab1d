"""TPU A/B of the fused ResidualFSQ eval sweep vs the unrolled XLA loop,
plus the on-silicon exactness gate (run on an idle host).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/rfsq_fused_tpu.py
"""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.utils import timeit_chained

Q, LEVELS = 8, (8, 5, 5, 5)
B, N = 2048, 2048
D = len(LEVELS)


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    floor_in = B * N * D * 4 / 819e9 * 1e3

    mods = {}
    for mode in ('off', 'auto'):
        m = vqtpu.ResidualFSQ(levels=list(LEVELS), num_quantizers=Q,
                              eval_fused=mode, rngs=nnx.Rngs(0))
        m.eval()
        mods[mode] = m

    # exactness gate (silicon): fused must be bit-identical to the loop
    out_l, ind_l = jax.jit(lambda x: mods['off'](x))(x)
    out_f, ind_f = jax.jit(lambda x: mods['auto'](x))(x)
    exact_out = bool((out_l == out_f).all())
    ind_match = float((ind_l == ind_f).mean())
    print(f'out bit-exact: {exact_out}  max|d|: '
          f'{float(jnp.abs(out_l - out_f).max()):.3g}  ind match: {ind_match}')

    times = {}
    for mode, m in mods.items():
        gdef, state = nnx.split(m)

        def fwd(x, state, gdef=gdef):
            mm = nnx.merge(gdef, state)
            return mm(x)

        t = timeit_chained(fwd, x, state, lo=8, hi=48, perturb_arg=0) * 1e3
        times[mode] = t
        print(f'eval_fused={mode:4s}: {t:7.3f} ms  {B*N/t/1e3:7.1f} Mtok/s '
              f'({floor_in / t * 100:4.1f}% of {floor_in:.3f} ms '
              f'single-read floor)')
    print(f'fused speedup: {times["off"] / times["auto"]:.2f}x')


if __name__ == '__main__':
    main()
