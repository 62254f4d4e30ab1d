"""HierarchicalVQ quality-parity run vs the torch reference at the
reference example defaults (/root/reference/examples/autoencoder_hq.py:64-75:
dim 32, codebook 512, scales (1,2,4,7), quant_resi 0.5, share_quant_resi 1,
batch 256, AdamW 3e-4, L1 rec on clamped output + alpha*commit, alpha=10).

One deviation: kmeans_init=False (the example uses kmeans_init=True, but
cross-framework kmeans sampling PRNGs cannot be aligned); instead the
initial codebook is copied torch -> jax like every other weight. The kmeans
math itself is pinned by golden tests (tests/test_golden_parity.py).

Same protocol as parity_vs_reference.py. Writes benchmarks/parity_hq.json.
"""

import argparse
import importlib
import json
import sys

import numpy as np

sys.path.insert(0, '/root/repo')
sys.modules.setdefault('einx', importlib.import_module('tests.einx_stub'))
sys.path.insert(0, '/root/reference')

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import optax
import torch
import torch.nn as nn
from flax import nnx

import vector_quantize_pytorch as ref
from vector_quantize_pytorch.utils import Sequential as RefSequential

import vqtpu
from vqtpu.core import metrics
from benchmarks.parity_vs_reference import batches

SCALES = (1, 2, 4, 7)


def build_ref_model(dim, codebook_size, seed):
    torch.manual_seed(seed)
    return RefSequential(
        nn.Conv2d(1, 16, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        nn.GELU(),
        nn.Conv2d(16, dim, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        ref.HierarchicalVQ(
            dim=dim, accept_image_fmap=True, scales=SCALES,
            quant_resi=0.5, share_quant_resi=1, rotation_trick=False,
            codebook_size=codebook_size, kmeans_init=False),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(dim, 16, kernel_size=3, stride=1, padding=1),
        nn.GELU(),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(16, 1, kernel_size=3, stride=1, padding=1),
    )


class OurModel(nnx.Module):
    """Same architecture; NHWC conv stack, NCHW fmap into HierarchicalVQ
    (the module's native fmap layout, as in the golden parity tests)."""

    def __init__(self, dim, codebook_size, rngs):
        conv = lambda cin, cout: nnx.Conv(cin, cout, (3, 3), padding=1,
                                          rngs=rngs)
        self.enc1 = conv(1, 16)
        self.enc2 = conv(16, dim)
        self.hq = vqtpu.HierarchicalVQ(
            dim=dim, accept_image_fmap=True, scales=SCALES,
            quant_resi=0.5, share_quant_resi=1, rotation_trick=False,
            codebook_size=codebook_size, kmeans_init=False, rngs=rngs)
        self.dec1 = conv(dim, 16)
        self.dec2 = conv(16, 1)

    def __call__(self, x):
        x = self.enc1(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        x = nnx.gelu(x)
        x = self.enc2(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        fmap = jnp.transpose(x, (0, 3, 1, 2))            # NHWC -> NCHW
        out = self.hq(fmap)
        q, inds, cmt = out[0], out[1], out[2]
        x = jnp.transpose(q, (0, 2, 3, 1))               # NCHW -> NHWC
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec1(x)
        x = nnx.gelu(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec2(x)
        return x, inds, jnp.sum(cmt)


def copy_weights(rm, om):
    convs_t = [m for m in rm.modules() if isinstance(m, nn.Conv2d)
               and m not in set(_phi_convs(rm))]
    convs_j = [om.enc1, om.enc2, om.dec1, om.dec2]
    assert len(convs_t) == len(convs_j), (len(convs_t), len(convs_j))
    for t, j in zip(convs_t, convs_j):
        w = t.weight.detach().numpy().copy()
        j.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        j.bias.value = jnp.asarray(t.bias.detach().numpy().copy())

    rh = [m for m in rm.modules() if isinstance(m, ref.HierarchicalVQ)][0]
    cb = om.hq.vq._codebook
    cb.embed.value = jnp.asarray(
        rh.vq._codebook.embed.detach().numpy().copy())
    cb.embed_avg.value = jnp.asarray(
        rh.vq._codebook.embed_avg.detach().numpy().copy())
    cb.cluster_size.value = jnp.asarray(
        rh.vq._codebook.cluster_size.detach().numpy().copy())
    # shared Phi smoother conv (torch OIHW -> flax HWIO)
    for rconv, ophi in zip(_phi_convs(rm), om.hq.phi_levels):
        ophi.conv.kernel.value = jnp.asarray(np.transpose(
            rconv.weight.detach().numpy().copy(), (2, 3, 1, 0)))
        ophi.conv.bias.value = jnp.asarray(
            rconv.bias.detach().numpy().copy())


def _phi_convs(rm):
    rh = [m for m in rm.modules() if isinstance(m, ref.HierarchicalVQ)][0]
    if getattr(rh, 'phi_shared', None) is not None:
        return [rh.phi_shared.conv]
    return [p.conv for p in rh.phi_levels]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=1000)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--dim', type=int, default=32)
    ap.add_argument('--codes', type=int, default=512)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--alpha', type=float, default=10.0)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('--out', type=str,
                    default='/root/repo/benchmarks/parity_hq.json')
    args = ap.parse_args()

    rm = build_ref_model(args.dim, args.codes, args.seed)
    om = OurModel(args.dim, args.codes, nnx.Rngs(args.seed))
    copy_weights(rm, om)

    opt_t = torch.optim.AdamW(rm.parameters(), lr=args.lr)
    ref_losses, ref_ind = [], None
    for x in batches(args.batch, args.iters, args.seed):
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        opt_t.zero_grad()
        out, inds, cmt = rm(xt)
        rec = (out.clamp(-1.0, 1.0) - xt).abs().mean()
        (rec + args.alpha * cmt).backward()
        opt_t.step()
        ref_losses.append(float(rec.detach()))
        ref_ind = inds
    ref_ind = np.concatenate(
        [i.detach().numpy().reshape(-1) for i in ref_ind])

    opt_j = nnx.Optimizer(om, optax.adamw(args.lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            out, inds, cmt = m(x)
            rec = jnp.abs(jnp.clip(out, -1.0, 1.0) - x).mean()
            return rec + args.alpha * cmt, (rec, inds)

        (_, (rec, inds)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        opt.update(model, grads)
        return rec, inds

    our_losses, our_ind = [], None
    for x in batches(args.batch, args.iters, args.seed):
        rec, inds = step(om, opt_j, jnp.asarray(x))
        our_losses.append(float(rec))
        our_ind = inds
    our_ind = np.concatenate([np.asarray(i).reshape(-1) for i in our_ind])

    tail = max(1, args.iters // 6)
    result = {
        'config': vars(args) | {'scales': SCALES, 'quant_resi': 0.5,
                                'share_quant_resi': 1,
                                'kmeans_init': False},
        'reference': {
            'rec_loss': float(np.mean(ref_losses[-tail:])),
            'perplexity': float(metrics.codebook_perplexity(
                jnp.asarray(ref_ind), args.codes)),
            'utilization': float(metrics.codebook_utilization(
                jnp.asarray(ref_ind), args.codes)),
        },
        'vqtpu': {
            'rec_loss': float(np.mean(our_losses[-tail:])),
            'perplexity': float(metrics.codebook_perplexity(
                jnp.asarray(our_ind), args.codes)),
            'utilization': float(metrics.codebook_utilization(
                jnp.asarray(our_ind), args.codes)),
        },
    }
    result['rel_delta'] = {
        k: abs(result['vqtpu'][k] - result['reference'][k])
        / max(result['reference'][k], 1e-9)
        for k in ('rec_loss', 'perplexity', 'utilization')
    }
    print(json.dumps(result, indent=2))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
    ok = (result['rel_delta']['rec_loss'] <= 0.01
          and result['rel_delta']['perplexity'] <= 0.01)
    print('PARITY ' + ('PASS (within 1%)' if ok else 'CHECK DELTAS'))


if __name__ == '__main__':
    main()
