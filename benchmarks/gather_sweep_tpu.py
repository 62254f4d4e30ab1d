"""Measure codebook-row gather strategies vs codebook size on the real chip.

Motivation (round 2): the shipped lookup is a one-hot matmul at HIGHEST
(3 bf16 passes — cost scales LINEARLY in c), with a jnp.take fallback only
above c=8192. If take's cost is ~flat in c (it is memory-bound: n rows of
d floats), the crossover belongs near c~512-1024, not 8192 — and the 4-pass
"roofline" in bench.py is not a floor at all for larger codebooks.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/gather_sweep_tpu.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from vqtpu.utils.profiling import timeit_chained  # noqa: E402
from bench import detect_specs  # noqa: E402

N = 1 << 20
D = 256


def onehot_gather(idx, embed, precision):
    oh = jax.nn.one_hot(idx, embed.shape[0], dtype=embed.dtype)
    return jnp.einsum('nc,cd->nd', oh, embed,
                      preferred_element_type=jnp.float32, precision=precision)


def main():
    peak_tflops, hbm = detect_specs()
    key = jax.random.PRNGKey(0)
    print(f'backend={jax.default_backend()} chip specs: {peak_tflops} Tf/s, {hbm} GB/s')

    def report(tag, secs, c, flops=0.0, bytes_moved=0.0):
        floor = max(flops / (peak_tflops * 1e12), bytes_moved / (hbm * 1e9))
        pct = 100.0 * floor / secs if secs > 0 else 0.0
        print(f'{tag:42s} c={c:6d}  {secs*1e3:8.3f} ms  '
              f'floor={floor*1e3:7.3f} ms  ({pct:5.1f}% of floor)')

    gather_bytes = N * D * 4 * 2 + N * 4      # read rows + write out + idx

    for c in (512, 1024, 2048, 8192, 65536):
        embed = jax.random.normal(key, (c, D), jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, c)

        t = timeit_chained(
            lambda i, e: jnp.take(e, i, axis=0), idx, embed, perturb_arg=1)
        report('take', t, c, bytes_moved=gather_bytes + c * D * 4)

        if c <= 2048:
            t = timeit_chained(
                functools.partial(onehot_gather,
                                  precision=jax.lax.Precision.HIGHEST),
                idx, embed, perturb_arg=1)
            report('one-hot HIGHEST (exact, 3 passes)', t, c,
                   flops=3 * 2.0 * N * c * D)

        # bf16 tier: bf16 codebook x exact one-hot in ONE pass — bit-exact
        # w.r.t. the bf16 codebook
        embed_bf16 = embed.astype(jnp.bfloat16)
        if c <= 8192:
            t = timeit_chained(
                functools.partial(onehot_gather,
                                  precision=jax.lax.Precision.DEFAULT),
                idx, embed_bf16, perturb_arg=1)
            report('one-hot bf16 codebook (1 pass)', t, c,
                   flops=2.0 * N * c * D)

        t = timeit_chained(
            lambda i, e: jnp.take(e, i, axis=0), idx, embed_bf16,
            perturb_arg=1)
        report('take bf16 rows', t, c,
               bytes_moved=N * D * 2 * 2 + N * 4 + c * D * 2)

    # selection at large c (XLA fused matmul+argmax), smaller n to keep
    # wall time sane
    from vqtpu.kernels.distance import nearest_code_xla
    n_sel = 1 << 17
    x = jax.random.normal(jax.random.PRNGKey(2), (n_sel, D), jnp.float32)
    for c in (8192, 65536):
        embed = jax.random.normal(key, (c, D), jnp.float32)
        t = timeit_chained(
            lambda xx, e: nearest_code_xla(xx, e), x, embed, perturb_arg=1)
        floor_flops = 2.0 * n_sel * c * D
        report(f'selection XLA n={n_sel}', t, c, flops=floor_flops,
               bytes_moved=n_sel * D * 4 + c * D * 4 + n_sel * 4)


if __name__ == '__main__':
    main()
