"""Drive every public quantizer once on the REAL TPU backend: train forward,
eval forward, decode round-trip where defined. The pytest suite forces CPU
(exact-math oracles + virtual mesh), so this catches TPU-only lowering or
precision issues. Run: PYTHONPATH=/root/.axon_site:/root/repo python
benchmarks/tpu_smoke_all.py
"""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu

assert jax.default_backend() == 'tpu', jax.default_backend()
k = jax.random.PRNGKey(0)
r = lambda s=0: nnx.Rngs(s)
results = []


def check(name, fn):
    try:
        fn()
        results.append((name, 'OK'))
    except Exception as e:
        results.append((name, f'FAIL {type(e).__name__}: {str(e)[:120]}'))


def rt(m, x, atol=1e-5):
    m.eval()
    out = m(x)
    q, ind = out[0], out[1]
    assert jnp.isfinite(q).all()
    decode = getattr(m, 'get_output_from_indices', None) or m.indices_to_codes
    dec = decode(ind)
    assert jnp.allclose(dec, q, atol=atol), float(jnp.abs(dec - q).max())


x = jax.random.normal(k, (2, 64, 32))

check('VectorQuantize', lambda: (
    (lambda m: (m(x), rt(m, x)))(
        vqtpu.VectorQuantize(dim=32, codebook_size=64, kmeans_init=True,
                             threshold_ema_dead_code=2, rngs=r()))))
check('VectorQuantize cosine+heads', lambda: (
    (lambda m: (m(x), rt(m, x)))(
        vqtpu.VectorQuantize(dim=32, codebook_size=64, use_cosine_sim=True,
                             heads=2, codebook_dim=16, rngs=r()))))
check('ResidualVQ', lambda: (
    (lambda m: (m(x), rt(m, x)))(
        vqtpu.ResidualVQ(dim=32, num_quantizers=4, codebook_size=64,
                         quantize_dropout=True, rngs=r()))))
check('ResidualVQ beam', lambda: (
    (lambda m: m(x))(
        vqtpu.ResidualVQ(dim=32, num_quantizers=3, codebook_size=64,
                         beam_size=2, rngs=r()))))
check('ResidualVQ QINCo', lambda: (
    (lambda m: (m(x), rt(m, x, atol=1e-4)))(
        vqtpu.ResidualVQ(dim=32, num_quantizers=3, codebook_size=64,
                         implicit_neural_codebook=True,
                         mlp_kwargs=dict(depth=2), rngs=r()))))
check('GroupedResidualVQ', lambda: (
    (lambda m: m(x))(
        vqtpu.GroupedResidualVQ(dim=32, groups=2, num_quantizers=2,
                                codebook_size=64, rngs=r()))))
check('RandomProjectionQuantizer', lambda: (
    (lambda m: m(x))(
        vqtpu.RandomProjectionQuantizer(dim=32, codebook_size=64,
                                        codebook_dim=16, num_codebooks=2,
                                        rngs=r()))))
x4 = jax.random.normal(k, (2, 64, 4))
check('FSQ', lambda: (
    (lambda m: (m(x4), rt(m, x4)))(
        vqtpu.FSQ(levels=[8, 5, 5, 5], rngs=r()))))
check('FSP', lambda: (
    (lambda m: m(jax.random.normal(k, (2, 64, 3))))(
        vqtpu.FSP(levels=[8, 6, 5], quantize_rate=0.5, rngs=r()))))
x16 = jax.random.normal(k, (2, 64, 16))
check('LFQ', lambda: (
    (lambda m: (m(x16), rt(m, x16)))(
        vqtpu.LFQ(codebook_size=2 ** 16, dim=16, rngs=r()))))
check('LFQ spherical', lambda: (
    (lambda m: m(x16))(
        vqtpu.LFQ(codebook_size=2 ** 16, dim=16, spherical=True, rngs=r()))))
check('ResidualLFQ', lambda: (
    (lambda m: m(x16))(
        vqtpu.ResidualLFQ(dim=16, codebook_size=2 ** 8, num_quantizers=2,
                          rngs=r()))))
check('GroupedResidualLFQ', lambda: (
    (lambda m: m(x16))(
        vqtpu.GroupedResidualLFQ(dim=16, groups=2, codebook_size=2 ** 4,
                                 num_quantizers=2, rngs=r()))))
check('ResidualFSQ', lambda: (
    (lambda m: (m(x4), rt(m, x4)))(
        vqtpu.ResidualFSQ(dim=4, levels=[8, 5, 5, 3], num_quantizers=2,
                          rngs=r()))))
check('GroupedResidualFSQ', lambda: (
    (lambda m: m(jax.random.normal(k, (2, 64, 8))))(
        vqtpu.GroupedResidualFSQ(dim=8, groups=2, levels=[8, 5, 5, 3],
                                 num_quantizers=2, rngs=r()))))
check('LatentQuantize', lambda: (
    (lambda m: m(jax.random.normal(k, (2, 9, 16))))(
        vqtpu.LatentQuantize(levels=[5, 5, 8], dim=9, rngs=r()))))
check('SimVQ', lambda: (
    (lambda m: (m(x), rt(m, x)))(
        vqtpu.SimVQ(dim=32, codebook_size=64, rngs=r()))))
check('ResidualSimVQ', lambda: (
    (lambda m: m(x))(
        vqtpu.ResidualSimVQ(dim=32, num_quantizers=2, codebook_size=64,
                            rngs=r()))))
check('BinaryMapper', lambda: (
    (lambda m: m(jax.random.normal(k, (4, 8)), return_indices=True))(
        vqtpu.BinaryMapper(bits=8, rngs=r()))))
check('HierarchicalVQ', lambda: (
    (lambda m: m(jax.random.normal(k, (2, 32, 4, 4))))(
        vqtpu.HierarchicalVQ(dim=32, codebook_size=64, scales=(1, 2, 4),
                             accept_image_fmap=True, rngs=r()))))
check('VQ bf16 tier (eval)', lambda: (
    (lambda m: (m.eval(), m(x), rt(m, x, atol=1e-2)))(
        vqtpu.VectorQuantize(dim=32, codebook_size=64,
                             quantize_tier='bf16', rngs=r()))))
check('VQ train_fused=on', lambda: (
    (lambda m: (m(x), m(x)))(
        vqtpu.VectorQuantize(dim=32, codebook_size=64,
                             train_fused='on', rngs=r()))))

fails = [x for x in results if x[1] != 'OK']
for name, res in results:
    print(f'{name:28s}: {res}')
print(f'\n{len(results) - len(fails)}/{len(results)} TPU smoke OK')
sys.exit(1 if fails else 0)
