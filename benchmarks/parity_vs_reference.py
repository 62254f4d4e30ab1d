"""Quality-parity run: vqtpu vs the torch reference at identical config.

Trains the reference example autoencoder (examples/autoencoder.py:34-47 —
conv encoder, VectorQuantize with accept_image_fmap, conv decoder; L1 rec +
alpha*commit, AdamW) in BOTH frameworks with:
  - identical initial weights (copied torch -> jax, OIHW -> HWIO),
  - identical data stream (shared numpy batches),
  - identical optimizer (AdamW, same lr/betas/eps/wd).

Reports final reconstruction loss, codebook perplexity, and utilization for
both, plus relative deltas — the "MSE + perplexity within 1%" bar from
BASELINE.md measured directly.

Usage: python benchmarks/parity_vs_reference.py [--iters 300] [--batch 64]
Writes PARITY.json at the repo root.
"""

import argparse
import importlib
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
sys.modules.setdefault('einx', importlib.import_module('tests.einx_stub'))
sys.path.insert(0, '/root/reference')

import jax

jax.config.update('jax_platforms', 'cpu')  # exact f32 matmuls for parity

import jax.numpy as jnp
import optax
import torch
import torch.nn as nn
from flax import nnx

import vector_quantize_pytorch as ref
from vector_quantize_pytorch.utils import Sequential as RefSequential

import vqtpu
from vqtpu.core import metrics


# --------------------------------------------------------------------------
# models
# --------------------------------------------------------------------------

def build_ref_model(dim, codebook_size, seed):
    torch.manual_seed(seed)
    return RefSequential(
        nn.Conv2d(1, 16, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        nn.GELU(),
        nn.Conv2d(16, 32, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        ref.VectorQuantize(dim=dim, codebook_size=codebook_size,
                           accept_image_fmap=True, rotation_trick=True),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(32, 16, kernel_size=3, stride=1, padding=1),
        nn.GELU(),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(16, 1, kernel_size=3, stride=1, padding=1),
    )


class OurModel(nnx.Module):
    """Same architecture, NHWC (TPU-native layout)."""

    def __init__(self, dim, codebook_size, rngs):
        conv = lambda cin, cout: nnx.Conv(cin, cout, (3, 3), padding=1,
                                          rngs=rngs)
        self.enc1 = conv(1, 16)
        self.enc2 = conv(16, 32)
        # NHWC-native: flatten spatial dims to tokens around the quantizer
        # (equivalent to the reference's accept_image_fmap NCHW reshape)
        self.vq = vqtpu.VectorQuantize(dim=dim, codebook_size=codebook_size,
                                       rotation_trick=True, rngs=rngs)
        self.dec1 = conv(32, 16)
        self.dec2 = conv(16, 1)

    def __call__(self, x):
        x = self.enc1(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        x = nnx.gelu(x)
        x = self.enc2(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        b, h, w, c = x.shape
        q, ind, commit = self.vq(x.reshape(b, h * w, c))
        q = q.reshape(b, h, w, c)
        x = jnp.repeat(jnp.repeat(q, 2, axis=1), 2, axis=2)  # nearest up x2
        x = self.dec1(x)
        x = nnx.gelu(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec2(x)
        return x, ind, commit


def copy_weights(ref_model, our_model):
    """torch conv (O, I, H, W) -> flax conv (H, W, I, O); codebook as-is."""
    convs_t = [m for m in ref_model.modules() if isinstance(m, nn.Conv2d)]
    convs_j = [our_model.enc1, our_model.enc2, our_model.dec1, our_model.dec2]
    assert len(convs_t) == len(convs_j)
    for t, j in zip(convs_t, convs_j):
        w = t.weight.detach().numpy().copy()          # (O, I, H, W)
        j.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        j.bias.value = jnp.asarray(t.bias.detach().numpy().copy())
    rvq = [m for m in ref_model.modules()
           if isinstance(m, ref.VectorQuantize)][0]
    cb = our_model.vq._codebook
    cb.embed.value = jnp.asarray(rvq._codebook.embed.detach().numpy().copy())
    cb.embed_avg.value = jnp.asarray(
        rvq._codebook.embed_avg.detach().numpy().copy())
    cb.cluster_size.value = jnp.asarray(
        rvq._codebook.cluster_size.detach().numpy().copy())


# --------------------------------------------------------------------------
# data: deterministic synthetic FashionMNIST-like stream shared by both
# --------------------------------------------------------------------------

def batches(batch, iters, seed):
    from vqtpu.models.data import image_batches

    gen = image_batches(batch_size=batch, seed=seed)
    for _ in range(iters):
        yield np.asarray(next(gen), np.float32)   # (b, 28, 28, 1) in [-1, 1]


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def train_ref(model, data, lr, alpha):
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    losses, inds = [], None
    for x in data:
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
        opt.zero_grad()
        out, ind, cmt = model(xt)
        rec = (out - xt).abs().mean()
        (rec + alpha * cmt).backward()
        opt.step()
        losses.append(float(rec))
        inds = ind
    return losses, inds.detach().numpy()


def train_ours(model, data, lr, alpha):
    opt = nnx.Optimizer(model, optax.adamw(lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            out, ind, cmt = m(x)
            rec = jnp.abs(out - x).mean()
            return rec + alpha * cmt, (rec, ind)

        (_, (rec, ind)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        opt.update(model, grads)
        return rec, ind

    losses, inds = [], None
    for x in data:
        rec, ind = step(model, opt, jnp.asarray(x))
        losses.append(float(rec))
        inds = ind
    return losses, np.asarray(inds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--dim', type=int, default=32)
    ap.add_argument('--codes', type=int, default=256)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--alpha', type=float, default=10.0)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('--out', type=str, default='/root/repo/PARITY.json')
    args = ap.parse_args()

    ref_model = build_ref_model(args.dim, args.codes, args.seed)
    our_model = OurModel(args.dim, args.codes, nnx.Rngs(args.seed))
    copy_weights(ref_model, our_model)

    t0 = time.time()
    ref_losses, ref_ind = train_ref(
        ref_model, batches(args.batch, args.iters, args.seed),
        args.lr, args.alpha)
    t_ref = time.time() - t0

    t0 = time.time()
    our_losses, our_ind = train_ours(
        our_model, batches(args.batch, args.iters, args.seed),
        args.lr, args.alpha)
    t_ours = time.time() - t0

    tail = max(1, args.iters // 6)
    ref_mse = float(np.mean(ref_losses[-tail:]))
    our_mse = float(np.mean(our_losses[-tail:]))
    ref_pplx = float(metrics.codebook_perplexity(
        jnp.asarray(ref_ind), args.codes))
    our_pplx = float(metrics.codebook_perplexity(
        jnp.asarray(our_ind), args.codes))
    ref_util = float(metrics.codebook_utilization(
        jnp.asarray(ref_ind), args.codes))
    our_util = float(metrics.codebook_utilization(
        jnp.asarray(our_ind), args.codes))

    result = {
        'config': vars(args),
        'reference': {'rec_loss': ref_mse, 'perplexity': ref_pplx,
                      'utilization': ref_util, 'wall_s': t_ref},
        'vqtpu': {'rec_loss': our_mse, 'perplexity': our_pplx,
                  'utilization': our_util, 'wall_s': t_ours},
        'rel_delta': {
            'rec_loss': abs(our_mse - ref_mse) / max(ref_mse, 1e-9),
            'perplexity': abs(our_pplx - ref_pplx) / max(ref_pplx, 1e-9),
            'utilization': abs(our_util - ref_util) / max(ref_util, 1e-9),
        },
    }
    print(json.dumps(result, indent=2))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)
    ok = (result['rel_delta']['rec_loss'] <= 0.01
          and result['rel_delta']['perplexity'] <= 0.01)
    print('PARITY ' + ('PASS (within 1%)' if ok else 'CHECK DELTAS'))


if __name__ == '__main__':
    main()
