"""Where does the ResidualVQ eval forward spend its non-floor time?

Round-4 question: RVQ q=8 c=1024 d=256 at 65k tokens measures ~7.1 ms
(79-82% of the 4-pass-per-layer floor), but the best measured components
(selection ~0.18-0.25 ms + take ~0.15 ms per layer) plus the residual
subtract/accumulate suggest ~4 ms attainable. This bench peels the module
in layers:

  1. full ResidualVQ module (the shipped number)
  2. bare VectorQuantize module at the same per-layer shape, once
  3. pure functional 8-layer chain: nearest_code + gather_codes +
     residual/accumulate (no module plumbing, no losses, no layout code)
  4. functional chain + per-layer zeros-loss and indices stack (the
     module's extra returns)

Run: PYTHONPATH=/root/.axon_site:/root/repo python
    benchmarks/rvq_overhead_tpu.py
"""

import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.kernels.distance import nearest_code, gather_codes
from vqtpu.utils import timeit_chained

B, N, D, C, Q = 32, 2048, 256, 1024, 8
TOK = B * N


def state_perturb(fwd, gdef, state):
    def run(acc, x, state):
        state = jax.tree.map(
            lambda a: a + acc * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(gdef, state)
        return fwd(acc, m, x)
    return run


def main():
    pass_ms = 2 * TOK * C * D / 197e12 * 1e3
    floor = Q * 4 * pass_ms
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))

    # 1. full module
    rvq = vqtpu.ResidualVQ(dim=D, num_quantizers=Q, codebook_size=C,
                           rngs=nnx.Rngs(0))
    rvq.eval()
    gdef, state = nnx.split(rvq)

    def fwd_full(acc, m, x):
        q, ind, loss = m(x)
        return (acc + q.sum() * 1e-12
                + ind.sum().astype(jnp.float32) * 1e-12 + loss.sum() * 0)

    t = timeit_chained(state_perturb(fwd_full, gdef, state),
                       jnp.float32(0), x, state, lo=2, hi=12) * 1e3
    print(f'1. full ResidualVQ       : {t:7.3f} ms ({floor/t*100:3.0f}% of '
          f'{floor:.3f} ms floor)')

    # 2. one bare VectorQuantize at the layer shape, x8 via fori chain
    vq = vqtpu.VectorQuantize(dim=D, codebook_size=C, rngs=nnx.Rngs(0))
    vq.eval()
    gdef1, state1 = nnx.split(vq)

    def fwd_vq8(acc, m, x):
        r = x
        out = jnp.zeros_like(x)
        for _ in range(Q):
            q, ind, loss = m(r)
            r = r - q
            out = out + q
            acc = acc + ind.sum().astype(jnp.float32) * 1e-12
        return acc + out.sum() * 1e-12

    t = timeit_chained(state_perturb(fwd_vq8, gdef1, state1),
                       jnp.float32(0), x, state1, lo=2, hi=12) * 1e3
    print(f'2. 8x bare VectorQuantize: {t:7.3f} ms ({floor/t*100:3.0f}%)')

    # 3. pure functional chain
    embeds = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (C, D), jnp.float32)
        for i in range(Q)
    ]

    def fwd_fn(acc, x, *embeds):
        r = x.reshape(-1, D)
        out = jnp.zeros_like(r)
        for e in embeds:
            e = e + acc * 1e-20
            idx = nearest_code(r, e)
            q = gather_codes(e, idx)
            r = r - q
            out = out + q
            acc = acc + idx.sum().astype(jnp.float32) * 1e-12
        return acc + out.sum() * 1e-12

    t = timeit_chained(fwd_fn, jnp.float32(0), x, *embeds, lo=2, hi=12) * 1e3
    print(f'3. functional chain      : {t:7.3f} ms ({floor/t*100:3.0f}%)')

    # 4. functional + the module's extra per-layer outputs
    def fwd_fn_outs(acc, x, *embeds):
        r = x.reshape(-1, D)
        out = jnp.zeros_like(r)
        inds, losses = [], []
        for e in embeds:
            e = e + acc * 1e-20
            idx = nearest_code(r, e)
            q = gather_codes(e, idx)
            r = r - q
            out = out + q
            inds.append(idx)
            losses.append(jnp.zeros((), jnp.float32))
        ind = jnp.stack(inds, -1)
        return (acc + out.sum() * 1e-12
                + ind.sum().astype(jnp.float32) * 1e-12
                + sum(losses) * 0)

    t = timeit_chained(fwd_fn_outs, jnp.float32(0), x, *embeds,
                       lo=2, hi=12) * 1e3
    print(f'4. functional + outputs  : {t:7.3f} ms ({floor/t*100:3.0f}%)')


if __name__ == '__main__':
    main()
