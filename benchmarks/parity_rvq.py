"""ResidualVQ quality-parity run vs the torch reference.

The reference ships no RVQ example, so this follows its example skeleton
(/root/reference/examples/autoencoder.py:49-60: conv encoder, quantizer,
conv decoder, L1 rec + alpha*commit, AdamW 3e-4) with the quantizer swapped
for ResidualVQ(dim=32, num_quantizers=4, codebook_size=256) — deterministic
config (no kmeans/stochastic sampling, whose PRNGs cannot be aligned across
frameworks; those paths are pinned by golden tests instead).

Same protocol as parity_vs_reference.py: identical initial weights incl.
every per-layer codebook, identical data stream, identical optimizer.
Writes benchmarks/parity_rvq.json.
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


class RefModel(nn.Module):
    """Reference example conv stack around ResidualVQ, token layout.

    NOT RefSequential with accept_image_fmap=True: upstream ResidualVQ is
    broken with image fmaps (residual_vq.py:489 rearranges '... d -> ... 1 d'
    on a (b, c, h, w) residual, treating width as the feature dim — shape
    error). Tokens (b, h*w, d) are the working upstream layout and match
    the vqtpu side exactly.
    """

    def __init__(self, dim, codebook_size, num_quantizers, seed):
        super().__init__()
        torch.manual_seed(seed)
        self.enc1 = nn.Conv2d(1, 16, kernel_size=3, stride=1, padding=1)
        self.enc2 = nn.Conv2d(16, 32, kernel_size=3, stride=1, padding=1)
        self.rvq = ref.ResidualVQ(dim=dim, codebook_size=codebook_size,
                                  num_quantizers=num_quantizers,
                                  rotation_trick=True)
        self.dec1 = nn.Conv2d(32, 16, kernel_size=3, stride=1, padding=1)
        self.dec2 = nn.Conv2d(16, 1, kernel_size=3, stride=1, padding=1)

    def forward(self, x):
        import torch.nn.functional as F
        x = F.max_pool2d(self.enc1(x), 2, 2)
        x = F.gelu(x)
        x = F.max_pool2d(self.enc2(x), 2, 2)
        b, c, h, w = x.shape
        tokens = x.flatten(2).transpose(1, 2)            # (b, h*w, c)
        q, ind, cmt = self.rvq(tokens)
        x = q.transpose(1, 2).reshape(b, c, h, w)
        x = F.interpolate(x, scale_factor=2, mode='nearest')
        x = F.gelu(self.dec1(x))
        x = F.interpolate(x, scale_factor=2, mode='nearest')
        return self.dec2(x), ind, cmt


def build_ref_model(dim, codebook_size, num_quantizers, seed):
    return RefModel(dim, codebook_size, num_quantizers, seed)


class OurModel(nnx.Module):
    """Same architecture, NHWC token layout around the quantizer."""

    def __init__(self, dim, codebook_size, num_quantizers, rngs):
        conv = lambda cin, cout: nnx.Conv(cin, cout, (3, 3), padding=1,
                                          rngs=rngs)
        self.enc1 = conv(1, 16)
        self.enc2 = conv(16, 32)
        self.rvq = vqtpu.ResidualVQ(
            dim=dim, codebook_size=codebook_size,
            num_quantizers=num_quantizers, rotation_trick=True, rngs=rngs)
        self.dec1 = conv(32, 16)
        self.dec2 = conv(16, 1)

    def __call__(self, x):
        x = self.enc1(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        x = nnx.gelu(x)
        x = self.enc2(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        b, h, w, c = x.shape
        q, ind, cmt = self.rvq(x.reshape(b, h * w, c))
        q = q.reshape(b, h, w, c)
        x = jnp.repeat(jnp.repeat(q, 2, axis=1), 2, axis=2)
        x = self.dec1(x)
        x = nnx.gelu(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec2(x)
        return x, ind, cmt.sum()


def copy_weights(rm, om):
    convs_t = [m for m in rm.modules() if isinstance(m, nn.Conv2d)]
    convs_j = [om.enc1, om.enc2, om.dec1, om.dec2]
    assert len(convs_t) == len(convs_j)
    for t, j in zip(convs_t, convs_j):
        w = t.weight.detach().numpy().copy()
        j.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        j.bias.value = jnp.asarray(t.bias.detach().numpy().copy())
    rrvq = [m for m in rm.modules() if isinstance(m, ref.ResidualVQ)][0]
    assert len(rrvq.layers) == len(om.rvq.layers)
    for rl, ol in zip(rrvq.layers, om.rvq.layers):
        cb = ol._codebook
        cb.embed.value = jnp.asarray(
            rl._codebook.embed.detach().numpy().copy())
        cb.embed_avg.value = jnp.asarray(
            rl._codebook.embed_avg.detach().numpy().copy())
        cb.cluster_size.value = jnp.asarray(
            rl._codebook.cluster_size.detach().numpy().copy())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=1000)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--dim', type=int, default=32)
    ap.add_argument('--codes', type=int, default=256)
    ap.add_argument('--quantizers', type=int, default=4)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--alpha', type=float, default=10.0)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('--out', type=str,
                    default='/root/repo/benchmarks/parity_rvq.json')
    args = ap.parse_args()

    rm = build_ref_model(args.dim, args.codes, args.quantizers, args.seed)
    om = OurModel(args.dim, args.codes, args.quantizers, nnx.Rngs(args.seed))
    copy_weights(rm, om)

    opt_t = torch.optim.AdamW(rm.parameters(), lr=args.lr)
    ref_losses, ref_ind = [], None
    for x in batches(args.batch, args.iters, args.seed):
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        opt_t.zero_grad()
        out, ind, cmt = rm(xt)
        rec = (out - xt).abs().mean()
        (rec + args.alpha * cmt.sum()).backward()
        opt_t.step()
        ref_losses.append(float(rec.detach()))
        ref_ind = ind
    ref_ind = ref_ind.detach().numpy()

    opt_j = nnx.Optimizer(om, optax.adamw(args.lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            out, ind, cmt = m(x)
            rec = jnp.abs(out - x).mean()
            return rec + args.alpha * cmt, (rec, ind)

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
        'config': vars(args),
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
