"""Probe: is ResidualFSQ's 4%-of-floor row VPU *lane waste*?

Every elementwise op in the residual-FSQ stack runs on (n, d=4) arrays —
4 of 128 vector lanes live, so the VPU executes 32x more vregs than the
element count needs, and at q=8 layers the chain measures 2.1 ms where one
HBM stream costs 0.08. The candidate packs the latent dim into full lanes:
reshape (N, 4) -> (N/32, 128) once, tile the per-dim constants (levels,
scales, clamp) 32x into per-lane patterns, run the whole residual chain
packed, and decode per-layer indices with a (M, 32, 4) x (4,) basis
contraction. Math is elementwise-identical -> outputs must be bit-exact.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/fsq_pack_probe.py [cpu]
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
from vqtpu.utils import timeit_chained

Q, LEVELS = 8, (8, 5, 5, 5)
B, N = 2048, 2048
D = len(LEVELS)
PACK = 128 // D


def main():
    rfsq = vqtpu.ResidualFSQ(levels=list(LEVELS), num_quantizers=Q,
                             rngs=nnx.Rngs(0))
    rfsq.eval()
    gdef, state = nnx.split(rfsq)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    floor_in = B * N * D * 4 / 819e9 * 1e3

    def module_fwd(x, state):
        m = nnx.merge(gdef, state)
        out, ind = m(x)
        return out, ind

    # packed constants: per-lane patterns, 32 tokens per row
    lv = np.asarray(LEVELS, np.float32)
    lv_p = jnp.asarray(np.tile(lv, PACK))                       # (128,)
    # the module's clamp constants are Python doubles rounded once to f32;
    # computing 1 + 1/(L-1) in f32 arithmetic is 1 ulp off for L=8
    clamp_p = jnp.asarray(np.tile(
        np.asarray(rfsq.soft_clamp_input_value, np.float32), PACK))
    # the module's own scales (jnp pow): numpy's f32 ** differs by 1 ulp,
    # which flips bin-edge brackets
    scales_p = jnp.tile(rfsq._scales(), (1, PACK))              # (q, 128)
    basis = jnp.asarray(
        np.cumprod(np.concatenate([[1.0], lv[:-1]])), jnp.float32)  # (d,)

    def packed_fwd(x, _scales_p):
        b, n, d = x.shape
        m = b * n // PACK
        z = x.reshape(m, PACK * d)                              # (M, 128)
        z = jnp.tanh(z / clamp_p) * clamp_p                     # soft clamp
        residual = z.astype(jnp.float32)
        qsum = jnp.zeros_like(residual)
        inds = []
        for i in range(Q):
            s = _scales_p[i]
            zi = residual / s
            bounded = jnp.clip(zi, -1.0, 1.0)
            bracket = jnp.floor((lv_p - 1) * (bounded + 1) / 2.0 + 0.5)
            codes = (2.0 / (lv_p - 1)) * bracket - 1.0
            quantized = codes * s
            residual = residual - quantized
            qsum = qsum + quantized
            # index codec, bit-matching fsq.codes_to_indices:
            # zs = (codes + 1) / (2 / (L - 1)); ind = round(sum(zs * basis))
            zs = (codes + 1.0) / (2.0 / (lv_p - 1))
            zs = zs.reshape(m, PACK, d)
            inds.append(jnp.round(zs @ basis).astype(jnp.int32))  # (M, PACK)
        out = qsum.reshape(b, n, d).astype(x.dtype)
        ind = jnp.stack(inds, axis=-1).reshape(b, n, Q)
        return out, ind

    ref_out, ref_ind = jax.jit(module_fwd)(x, state)
    got_out, got_ind = jax.jit(packed_fwd)(x, scales_p)
    print('out bit-exact:', bool((ref_out == got_out).all()),
          ' max|d|:', float(jnp.abs(ref_out - got_out).max()))
    print('ind match:', float((ref_ind == got_ind).mean()))

    t_mod = timeit_chained(module_fwd, x, state, lo=8, hi=48,
                           perturb_arg=0) * 1e3
    print(f'module : {t_mod:7.3f} ms ({floor_in / t_mod * 100:4.1f}% of '
          f'{floor_in:.3f} ms single-read floor)')
    t_pack = timeit_chained(packed_fwd, x, scales_p, lo=8, hi=48,
                            perturb_arg=0) * 1e3
    print(f'packed : {t_pack:7.3f} ms ({floor_in / t_pack * 100:4.1f}% of '
          f'floor)  speedup {t_mod / t_pack:.2f}x')

    # variant 2: channel-major (d, T) layout — per-dim constants broadcast
    # along the token/lane axis, index codec is a 4-sublane basis reduce
    clamp_c = jnp.asarray(np.asarray(rfsq.soft_clamp_input_value,
                                     np.float32))[:, None]      # (d, 1)
    lv_c = jnp.asarray(lv)[:, None]
    scales_c = rfsq._scales()[:, :, None]                       # (q, d, 1)
    basis_c = basis[:, None]

    def chanmaj_fwd(x, _scales_c):
        b, n, d = x.shape
        z = x.reshape(b * n, d).T                               # (d, T)
        z = jnp.tanh(z / clamp_c) * clamp_c
        residual = z.astype(jnp.float32)
        qsum = jnp.zeros_like(residual)
        inds = []
        for i in range(Q):
            s = _scales_c[i]
            zi = residual / s
            bounded = jnp.clip(zi, -1.0, 1.0)
            bracket = jnp.floor((lv_c - 1) * (bounded + 1) / 2.0 + 0.5)
            codes = (2.0 / (lv_c - 1)) * bracket - 1.0
            quantized = codes * s
            residual = residual - quantized
            qsum = qsum + quantized
            zs = (codes + 1.0) / (2.0 / (lv_c - 1))
            inds.append(jnp.round((zs * basis_c).sum(0)).astype(jnp.int32))
        out = qsum.T.reshape(b, n, d).astype(x.dtype)
        ind = jnp.stack(inds, axis=-1).reshape(b, n, Q)
        return out, ind

    got_out2, got_ind2 = jax.jit(chanmaj_fwd)(x, scales_c)
    print('chanmaj out max|d|:', float(jnp.abs(ref_out - got_out2).max()),
          ' ind match:', float((ref_ind == got_ind2).mean()))
    t_cm = timeit_chained(chanmaj_fwd, x, scales_c, lo=8, hi=48,
                          perturb_arg=0) * 1e3
    print(f'chanmaj: {t_cm:7.3f} ms ({floor_in / t_cm * 100:4.1f}% of '
          f'floor)  speedup {t_mod / t_cm:.2f}x')


if __name__ == '__main__':
    main()
