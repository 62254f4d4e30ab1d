"""TPU throughput of the full VQ training forward (selection + exact lookup
+ EMA statistics at HIGHEST precision) vs eval forward, at the BASELINE
shape. Measures the pure functional math (identical FLOPs to the module
path, without nnx state plumbing which can't thread a fori_loop carry).

Run on the default (TPU) backend: python benchmarks/train_step_tpu.py
"""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from vqtpu.core.utils import laplace_smoothing
from vqtpu.kernels.distance import quantize_lookup
from vqtpu.utils import timeit_chained

N, D, C = 1024 * 1024, 256, 512
DECAY = 0.99
EPS = 1e-5


def train_step(x, embed, embed_avg, cluster_size):
    idx, q = quantize_lookup(x, embed)
    onehot = jax.nn.one_hot(idx, C, dtype=jnp.float32)
    bins = onehot.sum(axis=0)
    embed_sum = jnp.einsum(
        'nd,nc->cd', x, onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cs = cluster_size + (bins - cluster_size) * (1 - DECAY)
    ea = embed_avg + (embed_sum - embed_avg) * (1 - DECAY)
    smoothed = laplace_smoothing(cs, C, EPS) * cs.sum()
    new_embed = ea / smoothed[:, None]
    return idx, q, cs, ea, new_embed


def eval_step(x, embed):
    return quantize_lookup(x, embed)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    embed = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)

    t_eval = timeit_chained(eval_step, x, embed, lo=2, hi=10,
                            perturb_arg=1)
    t_train = timeit_chained(
        train_step, x, embed, embed.astype(jnp.float32),
        jnp.ones(C, jnp.float32), lo=2, hi=10, perturb_arg=1,
    )

    peak_bf16 = 197e12
    pass_t = 2 * N * C * D / peak_bf16
    print(f'shape: n={N} d={D} c={C}  (1 MXU pass = {pass_t*1e3:.3f} ms)')
    print(f'eval  forward (select+lookup):    {t_eval*1e3:.3f} ms  '
          f'{N/t_eval/1e6:.0f} Mtok/s  ({t_eval/pass_t:.1f} passes-equiv)')
    print(f'train forward (+EMA stats @HIGHEST): {t_train*1e3:.3f} ms  '
          f'{N/t_train/1e6:.0f} Mtok/s  ({t_train/pass_t:.1f} passes-equiv)')


if __name__ == '__main__':
    main()


def train_step_default_prec(x, embed, embed_avg, cluster_size):
    idx, q = quantize_lookup(x, embed)
    onehot = jax.nn.one_hot(idx, C, dtype=jnp.float32)
    bins = onehot.sum(axis=0)
    embed_sum = jnp.einsum(
        'nd,nc->cd', x, onehot, preferred_element_type=jnp.float32,
    )
    cs = cluster_size + (bins - cluster_size) * (1 - DECAY)
    ea = embed_avg + (embed_sum - embed_avg) * (1 - DECAY)
    smoothed = laplace_smoothing(cs, C, EPS) * cs.sum()
    return idx, q, cs, ea, ea / smoothed[:, None]


def extra():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    embed = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)
    t = timeit_chained(
        train_step_default_prec, x, embed, embed.astype(jnp.float32),
        jnp.ones(C, jnp.float32), lo=2, hi=10, perturb_arg=1,
    )
    pass_t = 2 * N * C * D / 197e12
    print(f'train forward (stat_precision=DEFAULT): {t*1e3:.3f} ms  '
          f'{N/t/1e6:.0f} Mtok/s  ({t/pass_t:.1f} passes-equiv)')


if __name__ == '__main__':
    extra()
