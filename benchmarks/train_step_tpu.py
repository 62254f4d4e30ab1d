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


def train_step_fused(x, embed, embed_avg, cluster_size, *, block_n=1024):
    """The fused Pallas variant: selection + exact lookup + stats in one
    VMEM pass (kernels/train_fused.py) — candidate for closing the
    8.0-passes-equiv -> 7-pass-floor gap (VERDICT r2 #2)."""
    from vqtpu.kernels.train_fused import fused_train_quantize

    idx, q, bins, embed_sum = fused_train_quantize(x, embed, block_n=block_n)
    cs = cluster_size + (bins - cluster_size) * (1 - DECAY)
    ea = embed_avg + (embed_sum - embed_avg) * (1 - DECAY)
    smoothed = laplace_smoothing(cs, C, EPS) * cs.sum()
    return idx, q, cs, ea, ea / smoothed[:, None]


def fused(block_n=1024):
    from functools import partial
    from vqtpu.kernels.train_fused import fused_train_quantize

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    embed = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)

    # on-chip exactness gate first (Mosaic must honor HIGHEST on the one-hot
    # matmuls; if it silently lowers to one bf16 pass these asserts fail and
    # the fused path must not ship)
    idx, q, bins, esum = jax.jit(
        partial(fused_train_quantize, block_n=block_n)
    )(x, embed)
    import numpy as np
    ref_rows = np.asarray(jnp.take(embed, idx, axis=0))
    assert (np.asarray(q) == ref_rows).all(), 'lookup rows NOT bit-exact'
    onehot = jax.nn.one_hot(idx, C, dtype=jnp.float32)
    ref_esum = jnp.einsum('nd,nc->cd', x, onehot,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    err = float(jnp.abs(esum - ref_esum).max())
    rel = err / float(jnp.abs(ref_esum).max())
    print(f'fused exactness: rows bit-exact; esum max-abs-err {err:.3e} '
          f'(rel {rel:.2e}; f32-accumulation-order-level expected)')

    t = timeit_chained(
        partial(train_step_fused, block_n=block_n),
        x, embed, embed.astype(jnp.float32),
        jnp.ones(C, jnp.float32), lo=2, hi=10, perturb_arg=1,
    )
    pass_t = 2 * N * C * D / 197e12
    print(f'train forward (FUSED kernel, bn={block_n}): {t*1e3:.3f} ms  '
          f'{N/t/1e6:.0f} Mtok/s  ({t/pass_t:.1f} passes-equiv)')


def train_step_shared_onehot(x, embed, embed_avg, cluster_size):
    """VERDICT r2 #2's other attack: materialize the one-hot ONCE and feed
    the lookup AND both stat contractions from it (the shipped path builds
    one inside gather_codes and another for stats; XLA may or may not CSE
    them). Structural count: 1 selection + 3 lookup + 3 esum = the 7-pass
    floor, if XLA schedules it cleanly."""
    from vqtpu.kernels.distance import nearest_code

    idx = nearest_code(x, embed)
    onehot = jax.nn.one_hot(idx, C, dtype=jnp.float32)
    q = jnp.einsum(
        'nc,cd->nd', onehot, embed,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    bins = onehot.sum(axis=0)
    embed_sum = jnp.einsum(
        'nd,nc->cd', x, onehot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    cs = cluster_size + (bins - cluster_size) * (1 - DECAY)
    ea = embed_avg + (embed_sum - embed_avg) * (1 - DECAY)
    smoothed = laplace_smoothing(cs, C, EPS) * cs.sum()
    return idx, q, cs, ea, ea / smoothed[:, None]


def shared_onehot():
    from vqtpu.utils import timeit_chained

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    embed = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)
    t = timeit_chained(
        train_step_shared_onehot, x, embed, embed.astype(jnp.float32),
        jnp.ones(C, jnp.float32), lo=2, hi=10, perturb_arg=1,
    )
    pass_t = 2 * N * C * D / 197e12
    print(f'train forward (shared one-hot):   {t*1e3:.3f} ms  '
          f'{N/t/1e6:.0f} Mtok/s  ({t/pass_t:.1f} passes-equiv)')


if __name__ == '__main__':
    shared_onehot()


def fused_sweep():
    for bn in (512, 1024, 2048, 4096):
        try:
            fused(block_n=bn)
        except Exception as e:   # Mosaic VMEM limits at large bn
            print(f'train forward (FUSED kernel, bn={bn}): FAILED '
                  f'({type(e).__name__})')


if __name__ == '__main__':
    fused_sweep()
