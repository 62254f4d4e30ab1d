"""Probe: is HierarchicalVQ's 41-50%-of-floor gap the NCHW<->NHWC layout
churn (r5, after the zoo row)?

The shipped forward keeps the reference's channel-first fmap layout
end-to-end: every scale pays 2 full-res transposes around the Phi conv
(flax convs are NHWC) plus the VQ fmap path's token rearranges — at
(16, 256, 32, 32) f32 that is ~67 MB per transpose, ~8 of them per call.
The NHWC candidate transposes ONCE at entry and ONCE at exit and runs
pools (einsum), VQ (channel-last token layout), bilinear resize, and the
Phi conv all in NHWC.

Prints ms + %-of-floor for both and checks numerical agreement
(indices exact, recon allclose).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/hq_nhwc_probe.py [cpu]
"""
import sys

sys.path.insert(0, '/root/repo')

import jax

if 'cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np
from flax import nnx

import vqtpu
from vqtpu.composite.hierarchical_vq import _adaptive_pool_matrix
from vqtpu.utils import timeit_chained

SCALES, B, D, C, RES = (4, 8, 16, 32), 16, 256, 512, 32


def main():
    hq = vqtpu.HierarchicalVQ(dim=D, codebook_size=C, scales=SCALES,
                              accept_image_fmap=True, kmeans_init=False,
                              rngs=nnx.Rngs(0))
    hq.eval()
    gdef, state = nnx.split(hq)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, RES, RES))

    tok_total = B * sum(s * s for s in SCALES)
    peak = 197e12
    vq_flops = 4 * 2 * tok_total * C * D
    conv_flops = len(SCALES) * 2 * 9 * D * D * B * RES * RES
    floor = (vq_flops + conv_flops) / peak * 1e3

    def perturb(z, state):
        return jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)

    def module_fwd(z, x, state):
        m = nnx.merge(gdef, perturb(z, state))
        recon, inds, loss = m(x)
        return recon, inds[-1]

    # static pool matrices (host-built once, like the shipped path)
    pools = {s: jnp.asarray(_adaptive_pool_matrix(RES, s)) for s in SCALES
             if s != RES}

    def nhwc_fwd(z, x, state):
        m = nnx.merge(gdef, perturb(z, state))
        m.vq.accept_image_fmap = False          # channel-last token layout
        xh = jnp.transpose(x, (0, 2, 3, 1))     # ONE entry transpose
        residual = xh
        recon = jnp.zeros_like(xh)
        last_ind = None
        for i, s in enumerate(SCALES):
            if s != RES:
                p = pools[s]
                rd = jnp.einsum('oh,bhwc->bowc', p, residual,
                                preferred_element_type=jnp.float32)
                rd = jnp.einsum('pw,bowc->bopc', p, rd,
                                preferred_element_type=jnp.float32)
                rd = rd.astype(residual.dtype)
            else:
                rd = residual
            q, ind, _ = m.vq(rd.reshape(B, s * s, D))
            q = q.reshape(B, s, s, D)
            if s != RES:
                q = jax.image.resize(q, (B, RES, RES, D), method='bilinear')
            phi = m.phi_levels[m._phi_of_scale[i]]
            qc = phi.conv(q)
            q = (1.0 - phi.resi_ratio) * q + phi.resi_ratio * qc
            recon = recon + q
            residual = residual - q
            last_ind = ind
        return jnp.transpose(recon, (0, 3, 1, 2)), last_ind

    ref_out, ref_ind = jax.jit(module_fwd)(jnp.float32(0), x, state)
    got_out, got_ind = jax.jit(nhwc_fwd)(jnp.float32(0), x, state)
    err = float(jnp.abs(ref_out - got_out).max())
    print('out allclose:', bool(jnp.allclose(ref_out, got_out, atol=1e-4)),
          ' max|d|:', err)
    print('ind match:', float((ref_ind.reshape(-1) == got_ind.reshape(-1)).mean()))

    t_mod = timeit_chained(module_fwd, jnp.float32(0), x, state,
                           lo=4, hi=24) * 1e3
    print(f'module : {t_mod:7.3f} ms ({floor / t_mod * 100:4.1f}% of '
          f'{floor:.3f} ms floor)')
    t_nhwc = timeit_chained(nhwc_fwd, jnp.float32(0), x, state,
                            lo=4, hi=24) * 1e3
    print(f'nhwc   : {t_nhwc:7.3f} ms ({floor / t_nhwc * 100:4.1f}% of floor)'
          f'  speedup {t_mod / t_nhwc:.2f}x')


if __name__ == '__main__':
    main()
