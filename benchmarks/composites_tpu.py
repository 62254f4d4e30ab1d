"""TPU throughput of composite quantizers (eval forward), recorded in
BASELINE.md. Run on the default (TPU) backend."""
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.utils import timeit_chained


def bench(name, module, x, passes_floor_ms, lo=8, hi=72, ntok=None,
          perturb_x=False):
    module.eval()
    graphdef, state = nnx.split(module)

    if perturb_x:
        # elementwise/stateless families: the state perturbation below would
        # leave the body loop-invariant (FSQ/LFQ/BinaryMapper hold no f32
        # state) and XLA hoists the whole forward out of the timing loop
        # (measured r5: fabricated "<0.05 ms" rows). Perturbing x is free —
        # the scalar add fuses into x's first consumer.
        def fwd(x, state):
            m = nnx.merge(graphdef, state)
            out = m(x)
            return jax.tree.leaves(out)[:2]

        t = timeit_chained(fwd, x, state, lo=lo, hi=hi)
    else:
        def fwd(z, x, state):
            # perturb the (small) float state leaves, NOT x: adding the
            # carry to a 0.5GB input costs an extra full HBM pass and
            # inflates the number
            state = jax.tree.map(
                lambda a: a + z * 1e-20
                if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
                else a,
                state,
            )
            m = nnx.merge(graphdef, state)
            out = m(x)
            return jax.tree.leaves(out)[:2]

        t = timeit_chained(fwd, jnp.float32(0), x, state, lo=lo, hi=hi)
    n = ntok if ntok is not None else x.shape[0] * x.shape[1]
    if t <= 5e-5:
        print(f'{name:28s}: <0.05 ms (below tunnel timing resolution)')
        return t
    print(f'{name:28s}: {t*1e3:7.3f} ms  {n/t/1e6:6.1f} Mtok/s'
          + (f'  (floor {passes_floor_ms:.3f} ms -> '
             f'{passes_floor_ms/(t*1e3)*100:.0f}%)' if passes_floor_ms else ''))
    return t


def main():
    rngs = lambda s: nnx.Rngs(s)
    key = jax.random.PRNGKey(0)
    peak = 197e12
    # 4 MXU passes per layer: 1 bf16 selection + 3 for the bit-exact
    # one-hot lookup (see BASELINE.md)
    p = lambda n, c, d, layers=1: layers * 4 * 2 * n * c * d / peak * 1e3

    mxu_rows = 'ew' not in sys.argv          # `ew` = elementwise rows only

    n_big = 256 * 2048                                   # 524k tokens
    n_mid = 32 * 2048                                    # 65k tokens
    x_mid = jax.random.normal(key, (32, 2048, 256))
    if mxu_rows:
        x_big = jax.random.normal(key, (256, 2048, 256))
        bench('VectorQuantize c=512',
              vqtpu.VectorQuantize(dim=256, codebook_size=512, rngs=rngs(0)),
              x_big, p(n_big, 512, 256), lo=2, hi=16)
        bench('SimVQ c=512',
              vqtpu.SimVQ(dim=256, codebook_size=512, rngs=rngs(0)),
              x_big, p(n_big, 512, 256), lo=2, hi=16)
        bench('ResidualVQ q=8 c=1024',
              vqtpu.ResidualVQ(dim=256, num_quantizers=8, codebook_size=1024,
                               rngs=rngs(0)), x_mid,
              p(n_mid, 1024, 256, layers=8), lo=2, hi=12)
        bench('GroupedResidualVQ g=2 q=4',
              vqtpu.GroupedResidualVQ(dim=256, groups=2, num_quantizers=4,
                                      codebook_size=1024, rngs=rngs(0)),
              x_mid, p(n_mid, 1024, 128, layers=8), lo=2, hi=12)

    # elementwise (VPU/HBM-bound) families: these never touch the MXU, and
    # inside the timing loop the outputs are consumed by a fused reduction
    # (never written back to HBM) — which is also the realistic serving
    # picture on TPU, where the quantizer output feeds the next op in the
    # SAME jit. The honest floor is therefore the INPUT stream: one read of
    # x at the measured v5e HBM rate. Shapes are sized so the forward
    # clears the ~0.05 ms tunnel timing resolution (2048 x 2048 tokens),
    # and x (not the state) carries the anti-hoisting perturbation
    # (perturb_x=True — see bench()).
    hbm = lambda nbytes: nbytes / 819e9 * 1e3            # ms
    n_big4 = 2048 * 2048                                 # 4.2M tokens
    bench('FSQ levels=8x[8,5..5]',
          vqtpu.FSQ(levels=[8, 5, 5, 5, 5, 5, 5, 5], rngs=rngs(0)),
          jax.random.normal(key, (2048, 2048, 8)),
          hbm(n_big4 * 8 * 4), lo=16, hi=144, perturb_x=True)
    bench('LFQ 2^16',
          vqtpu.LFQ(codebook_size=2 ** 16, dim=16, rngs=rngs(0)),
          jax.random.normal(key, (2048, 2048, 16)),
          hbm(n_big4 * 16 * 4), lo=16, hi=144, perturb_x=True)

    # ---- round-5 full-zoo coverage (VERDICT r4 #2) ----

    if mxu_rows:
        # ResidualSimVQ: q MXU-bound selection layers, same floor model as
        # RVQ
        bench('ResidualSimVQ q=4 c=512',
              vqtpu.ResidualSimVQ(dim=256, num_quantizers=4,
                                  codebook_size=512, rngs=rngs(0)),
              x_mid, p(n_mid, 512, 256, layers=4), lo=2, hi=12)

        # HierarchicalVQ: floor = VQ selection over the multi-scale token
        # total + the per-level full-res 3x3 Phi convs (which dominate)
        scales, b_hq, d_hq, c_hq, res = (4, 8, 16, 32), 16, 256, 512, 32
        tok_total = b_hq * sum(s * s for s in scales)
        vq_flops = 4 * 2 * tok_total * c_hq * d_hq
        conv_flops = len(scales) * 2 * 9 * d_hq * d_hq * b_hq * res * res
        bench('HierarchicalVQ 4 scales',
              vqtpu.HierarchicalVQ(dim=d_hq, codebook_size=c_hq,
                                   scales=scales, accept_image_fmap=True,
                                   rngs=rngs(0)),
              jax.random.normal(key, (b_hq, d_hq, res, res)),
              (vq_flops + conv_flops) / peak * 1e3, lo=4, hi=24,
              ntok=tok_total)

    # residual stacks of elementwise quantizers: XLA fuses the per-layer
    # residual chain entirely in registers/VMEM (measured r5: the 8-layer
    # stack runs at ~single-pass speed), so the floor stays the one input
    # read — NOT 2 passes per layer
    bench('ResidualFSQ q=8 levels=[8,5,5,5]',
          vqtpu.ResidualFSQ(dim=4, levels=[8, 5, 5, 5], num_quantizers=8,
                            rngs=rngs(0)),
          jax.random.normal(key, (2048, 2048, 4)),
          hbm(n_big4 * 4 * 4), lo=8, hi=48, perturb_x=True)
    bench('ResidualLFQ q=8 c=2^8',
          vqtpu.ResidualLFQ(dim=16, codebook_size=2 ** 8, num_quantizers=8,
                            rngs=rngs(0)),
          jax.random.normal(key, (2048, 2048, 16)),
          hbm(n_big4 * 16 * 4), lo=8, hi=48, perturb_x=True)

    # LatentQuantize / FSP at a serving-realistic dim=256 (projected): the
    # quantization itself is a per-dim VPU op on 3 latent dims; traffic is
    # the dim=256 in/out stream (shapes sized above tunnel jitter)
    n_lat = 256 * 2048
    bench('LatentQuantize d=256->[5,5,8]',
          vqtpu.LatentQuantize(levels=[5, 5, 8], dim=256, rngs=rngs(0)),
          jax.random.normal(key, (256, 256, 2048)),
          hbm(n_lat * 256 * 4), lo=8, hi=48, ntok=n_lat, perturb_x=True)
    bench('FSP d=256->[8,6,5]',
          vqtpu.FSP(levels=[8, 6, 5], dim=256, rngs=rngs(0)),
          jax.random.normal(key, (256, 2048, 256)),
          hbm(n_lat * 256 * 4), lo=8, hi=48, perturb_x=True)

    # BinaryMapper: reads (n, bits) logits; the (n, 2^bits) one-hot stays
    # in the fused consumer. deterministic_on_eval: the serving config —
    # the default (reference-matching) eval path SAMPLES the Bernoullis,
    # and NNX RngCount mutation cannot cross the timing fori_loop's trace
    # level.
    n_bm = 1024 * 2048
    bench('BinaryMapper bits=8',
          vqtpu.BinaryMapper(bits=8, deterministic_on_eval=True,
                             rngs=rngs(0)),
          jax.random.normal(key, (1024, 2048, 8)),
          hbm(n_bm * 8 * 4), lo=8, hi=48, perturb_x=True)

    if mxu_rows:
        # beam search at the BASELINE beam shape (8k tokens): exact
        # lax.top_k vs approx_topk (lax.approx_max_k) per-layer candidate
        # selection
        x_beam = jax.random.normal(key, (4, 2048, 256))
        t_exact = bench(
            'RVQ beam=4 q=8 c=1024 exact',
            vqtpu.ResidualVQ(dim=256, num_quantizers=8, codebook_size=1024,
                             beam_size=4, rngs=rngs(0)),
            x_beam, 0, lo=2, hi=6)
        t_approx = bench(
            'RVQ beam=4 q=8 c=1024 approx',
            vqtpu.ResidualVQ(dim=256, num_quantizers=8, codebook_size=1024,
                             beam_size=4, approx_topk=True, rngs=rngs(0)),
            x_beam, 0, lo=2, hi=6)
        if t_exact and t_approx:
            print(f'{"approx_topk speedup":28s}: {t_exact/t_approx:.3f}x')


if __name__ == '__main__':
    main()
