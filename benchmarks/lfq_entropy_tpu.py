"""A/B: XLA chunked LFQ entropy vs the fused Pallas sweeps (2^18 codes).

Measures forward and forward+backward of the entropy statistics at the
BASELINE LFQ 2^18 shape (8k tokens, d=18, spherical, inv_temp 100) with
the chained-slope harness. Run on the TPU backend:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/lfq_entropy_tpu.py
"""

import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

from vqtpu.quantizers.lfq import LFQ
from vqtpu.kernels.lfq_entropy import (
    code_magnitude, lfq_entropy_stats_fused,
)
from vqtpu.utils import timeit_chained


def main(n=8192, dim=18, inv_temp=100.0, chunk=1 << 14, block_n=512,
         block_k=2048, seed=0):
    k = 1 << dim
    lfq = LFQ(codebook_size=k, dim=dim, spherical=True,
              entropy_chunk_size=chunk, rngs=nnx.Rngs(0))
    v = code_magnitude(dim, float(lfq.codebook_scale), True)
    x = jax.random.normal(jax.random.PRNGKey(seed), (n, dim), jnp.float32)
    w = jnp.ones((n,), jnp.float32)

    def xla_stats(x2d):
        flat = x2d[:, None, :]
        ent_sum, avgp = lfq._streamed_entropy_stats(
            flat, w, inv_temp, chunk
        )
        return ent_sum, avgp.reshape(-1)

    def fused_stats(x2d):
        ent, avgp = lfq_entropy_stats_fused(
            x2d, w, k=k, v=v, inv_temp=inv_temp, block_n=block_n,
            block_k=block_k,
        )
        return (ent * w).sum(), avgp

    def loss_of(stats):
        def loss(x2d):
            ent_sum, avgp = stats(x2d)
            per_sample = ent_sum / n
            avg_prob = avgp / n
            codebook_ent = (
                -avg_prob * jnp.log(jnp.maximum(avg_prob, 1e-5))
            ).sum()
            return per_sample - codebook_ent
        return loss

    # exactness cross-check on-device
    es, as_ = jax.jit(xla_stats)(x)
    ef, af = jax.jit(fused_stats)(x)
    print(f'ent_sum: xla {float(es):.6f} fused {float(ef):.6f} '
          f'rel {abs(float(es - ef)) / abs(float(es)):.2e}')
    print(f'avgp max abs diff {float(jnp.abs(as_ - af).max()):.2e}')

    gx = jax.jit(jax.grad(loss_of(xla_stats)))(x)
    gf = jax.jit(jax.grad(loss_of(fused_stats)))(x)
    rel = float(jnp.abs(gx - gf).max() / jnp.abs(gx).max())
    print(f'grad max rel diff {rel:.2e}')

    # timings (chained slopes; carry consumes full reductions)
    t_xf = timeit_chained(lambda a: xla_stats(a)[0]
                          + xla_stats(a)[1].sum() * 0, x)
    print(f'fwd  xla   {t_xf*1e3:8.2f} ms')
    t_ff = timeit_chained(lambda a: fused_stats(a)[0]
                          + fused_stats(a)[1].sum() * 0, x)
    print(f'fwd  fused {t_ff*1e3:8.2f} ms   ({t_xf/t_ff:.2f}x)')

    gxla = jax.grad(loss_of(xla_stats))
    gfus = jax.grad(loss_of(fused_stats))
    t_xg = timeit_chained(lambda a: gxla(a).sum(), x)
    print(f'grad xla   {t_xg*1e3:8.2f} ms')
    t_fg = timeit_chained(lambda a: gfus(a).sum(), x)
    print(f'grad fused {t_fg*1e3:8.2f} ms   ({t_xg/t_fg:.2f}x)')


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=8192)
    ap.add_argument('--dim', type=int, default=18)
    ap.add_argument('--block_n', type=int, default=512)
    ap.add_argument('--block_k', type=int, default=2048)
    a = ap.parse_args()
    main(n=a.n, dim=a.dim, block_n=a.block_n, block_k=a.block_k)
