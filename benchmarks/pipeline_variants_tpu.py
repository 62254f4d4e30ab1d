"""End-to-end select+lookup pipeline variants at several codebook sizes —
the decision benchmark for gather_codes' crossover and the bf16 tier.

Unlike gather_sweep_tpu.py (isolated ops, hoisting caveats), every variant
here runs the FULL pipeline x -> indices -> quantized inside the chained
harness with the codebook perturbed per iteration, exactly like bench.py.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pipeline_variants_tpu.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from vqtpu.utils.profiling import timeit_chained  # noqa: E402
from vqtpu.kernels.distance import nearest_code_xla  # noqa: E402
from bench import detect_specs  # noqa: E402

N = 1 << 20
D = 256


def pipe_take(x, embed):
    idx = nearest_code_xla(x, embed)
    return idx, jnp.take(embed, idx, axis=0)


def pipe_onehot(x, embed):
    idx = nearest_code_xla(x, embed)
    oh = jax.nn.one_hot(idx, embed.shape[0], dtype=jnp.float32)
    q = jnp.einsum('nc,cd->nd', oh, embed,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return idx, q


def pipe_bf16(x, embed):
    """bf16 tier: inputs/codebook cast to bf16; selection scores and the
    lookup accumulate in f32 from bf16 operands — exact w.r.t. the bf16
    values, 2 MXU passes total."""
    xb = x.astype(jnp.bfloat16)
    eb = embed.astype(jnp.bfloat16)
    scores = jnp.einsum('nd,cd->nc', xb, eb,
                        preferred_element_type=jnp.float32)
    bias = -0.5 * (eb.astype(jnp.float32) ** 2).sum(-1)
    idx = jnp.argmax(scores + bias, axis=-1).astype(jnp.int32)
    oh = jax.nn.one_hot(idx, embed.shape[0], dtype=jnp.bfloat16)
    q = jnp.einsum('nc,cd->nd', oh, eb,
                   preferred_element_type=jnp.float32)
    return idx, q.astype(jnp.bfloat16)


def main():
    peak_tflops, hbm = detect_specs()
    print(f'backend={jax.default_backend()}')

    def report(tag, secs, c, passes):
        flops = passes * 2.0 * N * c * D
        mem = N * D * 4 * 2 + N * 4 + c * D * 4
        floor = max(flops / (peak_tflops * 1e12), mem / (hbm * 1e9))
        print(f'{tag:34s} c={c:6d}  {secs*1e3:8.3f} ms  '
              f'{N/secs/1e6:7.1f} Mvec/s  floor({passes}p)={floor*1e3:7.3f} '
              f'({100*floor/secs:5.1f}%)')

    for c in (512, 1024, 2048, 8192):
        x = jax.random.normal(jax.random.PRNGKey(2), (N, D), jnp.float32)
        embed = jax.random.normal(jax.random.PRNGKey(0), (c, D), jnp.float32)

        t = timeit_chained(pipe_onehot, x, embed, perturb_arg=1)
        report('select + one-hot HIGHEST (exact)', t, c, 4)
        t = timeit_chained(pipe_take, x, embed, perturb_arg=1)
        report('select + take (exact)', t, c, 1)
        t = timeit_chained(pipe_bf16, x, embed, perturb_arg=1)
        report('bf16 tier (2 passes)', t, c, 2)
        print()


if __name__ == '__main__':
    main()
