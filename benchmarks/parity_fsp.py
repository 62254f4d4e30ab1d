"""FSP quality-parity run vs the torch reference at the reference example
defaults (/root/reference/examples/autoencoder_fsp.py:55-70: levels [8,6,5],
act tanh, vector_norm var_tanh, quantize_rate 0.5, norm_loss_weight 1.0,
batch 256, AdamW 3e-4, L1 rec on clamped output + norm loss).

Same protocol as parity_vs_reference.py: identical initial weights
(torch -> jax; FSP itself is parameter-free at dim == len(levels)),
identical data stream, identical optimizer. NOTE: quantize_rate < 1.0 draws
framework-native uniforms each step (reference
finite_scalar_perturbation.py:330-346), which cannot be cross-aligned — at
the example default 0.5 this is a seeded chaos-band comparison like the VQ
study; run --quantize_rate 1.0 for the fully deterministic strict row.
Writes benchmarks/parity_fsp.json.
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


def build_ref_fsp(levels, seed, **fsp_kwargs):
    torch.manual_seed(seed)
    return RefSequential(
        nn.Conv2d(1, 16, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        nn.GELU(),
        nn.Conv2d(16, 32, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        nn.Conv2d(32, len(levels), kernel_size=1),
        ref.FSP(levels, channel_first=True, **fsp_kwargs),
        nn.Conv2d(len(levels), 32, kernel_size=3, stride=1, padding=1),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(32, 16, kernel_size=3, stride=1, padding=1),
        nn.GELU(),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(16, 1, kernel_size=3, stride=1, padding=1),
    )


class OurFSPModel(nnx.Module):
    """Reference example architecture, NHWC token layout around FSP."""

    def __init__(self, levels, rngs, **fsp_kwargs):
        conv = lambda cin, cout: nnx.Conv(cin, cout, (3, 3), padding=1,
                                          rngs=rngs)
        self.enc1 = conv(1, 16)
        self.enc2 = conv(16, 32)
        self.down = nnx.Conv(32, len(levels), (1, 1), rngs=rngs)
        self.fsp = vqtpu.FSP(levels, **fsp_kwargs, rngs=rngs)
        self.dec0 = conv(len(levels), 32)
        self.dec1 = conv(32, 16)
        self.dec2 = conv(16, 1)

    def __call__(self, x):
        x = self.enc1(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        x = nnx.gelu(x)
        x = self.enc2(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        x = self.down(x)
        b, h, w, c = x.shape
        q, ind, norm_loss, _ = self.fsp(x.reshape(b, h * w, c))
        q = q.reshape(b, h, w, c)
        x = self.dec0(q)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec1(x)
        x = nnx.gelu(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec2(x)
        return x, ind, norm_loss


def t2n(t):
    return np.array(t.detach().numpy())


def copy_weights(rm, om):
    convs_t = [m for m in rm.modules() if isinstance(m, nn.Conv2d)]
    convs_j = [om.enc1, om.enc2, om.down, om.dec0, om.dec1, om.dec2]
    assert len(convs_t) == len(convs_j)
    for t, j in zip(convs_t, convs_j):
        w = t2n(t.weight)                              # (O, I, H, W)
        j.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        j.bias.value = jnp.asarray(t2n(t.bias))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=1000)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('--quantize_rate', type=float, default=0.5)
    ap.add_argument('--norm_loss_weight', type=float, default=1.0)
    ap.add_argument('--out', type=str,
                    default='/root/repo/benchmarks/parity_fsp.json')
    args = ap.parse_args()

    levels = [8, 6, 5]
    codes = int(np.prod(levels))
    fsp_kwargs = dict(act_name='tanh', quantize_rate=args.quantize_rate,
                      need_inv_act=False, vector_norm='var_tanh')

    rm = build_ref_fsp(levels, args.seed, **fsp_kwargs)
    om = OurFSPModel(levels, nnx.Rngs(args.seed), **fsp_kwargs)
    copy_weights(rm, om)

    # reference train loop (example :108-118: clamp, L1, rec + norm loss)
    opt_t = torch.optim.AdamW(rm.parameters(), lr=args.lr)
    ref_losses, ref_ind = [], None
    for x in batches(args.batch, args.iters, args.seed):
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        opt_t.zero_grad()
        out, ind, norm_loss, _ = rm(xt)
        rec = (out.clamp(-1.0, 1.0) - xt).abs().mean()
        (rec + args.norm_loss_weight * norm_loss).backward()
        opt_t.step()
        ref_losses.append(float(rec.detach()))
        ref_ind = ind
    ref_ind = t2n(ref_ind)

    opt_j = nnx.Optimizer(om, optax.adamw(args.lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            out, ind, norm_loss = m(x)
            rec = jnp.abs(jnp.clip(out, -1.0, 1.0) - x).mean()
            return rec + args.norm_loss_weight * norm_loss, (rec, ind)

        (_, (rec, ind)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        opt.update(model, grads)
        return rec, ind

    our_losses, our_ind = [], None
    for x in batches(args.batch, args.iters, args.seed):
        rec, ind = step(om, opt_j, jnp.asarray(x))
        our_losses.append(float(rec))
        our_ind = ind
    our_ind = np.asarray(our_ind)

    tail = max(1, args.iters // 6)
    result = {
        'config': vars(args) | {'levels': levels},
        'reference': {
            'rec_loss': float(np.mean(ref_losses[-tail:])),
            'perplexity': float(metrics.codebook_perplexity(
                jnp.asarray(ref_ind), codes)),
            'utilization': float(metrics.codebook_utilization(
                jnp.asarray(ref_ind), codes)),
        },
        'vqtpu': {
            'rec_loss': float(np.mean(our_losses[-tail:])),
            'perplexity': float(metrics.codebook_perplexity(
                jnp.asarray(our_ind), codes)),
            'utilization': float(metrics.codebook_utilization(
                jnp.asarray(our_ind), codes)),
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
    ok = result['rel_delta']['rec_loss'] <= 0.01
    print('PARITY ' + ('PASS (within 1%)' if ok else 'CHECK DELTAS'))


if __name__ == '__main__':
    main()
