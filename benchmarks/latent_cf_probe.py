"""Probe: can LatentQuantize reach its 2-pass HBM floor by staying
channel-first (r5, after the zoo row measured ~30% of floor)?

The shipped forward does moveaxis(1,-1) + reshape + Linear + moveaxis back —
the big (b, d, n) tensor gets relaid out twice. The channel-first candidate
contracts the projections directly against the native layout
(einsum 'de,bdn->ben' / 'ed,ben->bdn'), quantizes the small (b, E, n)
latent with a one-hot contraction (no per-element gather), and writes the
channel-first output straight out.

Prints ms + %-of-floor for both, and checks numerical agreement.
"""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.utils import timeit_chained

sg = jax.lax.stop_gradient

B, D, N = 256, 256, 2048
LEVELS = (5, 5, 8)


def main():
    lq = vqtpu.LatentQuantize(levels=list(LEVELS), dim=D, rngs=nnx.Rngs(0))
    lq.eval()
    gdef, state = nnx.split(lq)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, N))
    floor = 2 * B * N * D * 4 / 819e9 * 1e3

    def module_fwd(z, x, state):
        state = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(gdef, state)
        out, ind, _ = m(x)
        return out, ind

    w_in = lq.project_in.kernel[...]
    b_in = lq.project_in.bias[...]
    w_out = lq.project_out.kernel[...]
    b_out = lq.project_out.bias[...]
    values = [v[...] for v in lq.values_per_latent]
    basis = jnp.asarray(lq.basis, jnp.float32)
    half_width = jnp.floor_divide(jnp.asarray(LEVELS, jnp.int32), 2)

    def cf_fwd(z, x, w_in, b_in, w_out, b_out, *values):
        w_in = w_in + z * 1e-20
        ze = jnp.einsum('de,bdn->ben', w_in, x) + b_in[:, None]   # (b, E, n)
        qdims, inds = [], []
        for i, v in enumerate(values):
            zi = ze[:, i, :]
            dist = jnp.abs(zi[..., None] - v)                     # (b, n, L)
            onehot = (dist == dist.min(-1, keepdims=True))
            onehot = onehot / onehot.sum(-1, keepdims=True)       # tie-safe
            qdims.append(jnp.einsum('bnl,l->bn', onehot.astype(zi.dtype), v))
        q = jnp.stack(qdims, axis=1)                              # (b, E, n)
        q = ze + sg(q - ze)
        # codec on the quantized VALUES (reference split: learned values,
        # canonical grid codec)
        zhat = q * (2 * half_width)[:, None] + half_width[:, None]
        ind = (zhat * basis[:, None]).sum(axis=1).astype(jnp.int32)
        out = jnp.einsum('ed,ben->bdn', w_out, q) + b_out[:, None]
        return out, ind

    ref_out, ref_ind = jax.jit(module_fwd)(jnp.float32(0), x, state)
    got_out, got_ind = jax.jit(cf_fwd)(
        jnp.float32(0), x, w_in, b_in, w_out, b_out, *values)
    print('out allclose:',
          bool(jnp.allclose(ref_out, jnp.asarray(got_out), atol=2e-5)),
          ' max|d|:', float(jnp.abs(ref_out - got_out).max()))
    print('ind match:', float((ref_ind == got_ind).mean()))

    t_mod = timeit_chained(module_fwd, jnp.float32(0), x, state,
                           lo=8, hi=48) * 1e3
    print(f'module   : {t_mod:7.3f} ms ({floor / t_mod * 100:4.1f}% of '
          f'{floor:.3f} ms floor)')
    t_cf = timeit_chained(cf_fwd, jnp.float32(0), x, w_in, b_in, w_out,
                          b_out, *values, lo=8, hi=48) * 1e3
    print(f'chan-1st : {t_cf:7.3f} ms ({floor / t_cf * 100:4.1f}% of floor)'
          f'  speedup {t_mod / t_cf:.2f}x')


if __name__ == '__main__':
    main()
