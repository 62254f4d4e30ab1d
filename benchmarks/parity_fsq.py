"""FSQ quality-parity run vs the torch reference (stateless quantizer:
no EMA chaos, so trajectories track tightly even over 1000 iters).

Same protocol as parity_vs_reference.py: identical weights, data, optimizer.
Writes benchmarks/parity_fsq.json.
"""

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

LEVELS = [8, 6, 5]


def build_ref_fsq(dim, seed):
    torch.manual_seed(seed)
    return RefSequential(
        nn.Conv2d(1, 16, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        nn.GELU(),
        nn.Conv2d(16, 32, kernel_size=3, stride=1, padding=1),
        nn.MaxPool2d(kernel_size=2, stride=2),
        ref.FSQ(levels=LEVELS, dim=dim),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(32, 16, kernel_size=3, stride=1, padding=1),
        nn.GELU(),
        nn.Upsample(scale_factor=2, mode='nearest'),
        nn.Conv2d(16, 1, kernel_size=3, stride=1, padding=1),
    )


class OurFSQModel(nnx.Module):
    def __init__(self, dim, rngs):
        conv = lambda cin, cout: nnx.Conv(cin, cout, (3, 3), padding=1,
                                          rngs=rngs)
        self.enc1 = conv(1, 16)
        self.enc2 = conv(16, 32)
        self.fsq = vqtpu.FSQ(levels=LEVELS, dim=dim, rngs=rngs)
        self.dec1 = conv(32, 16)
        self.dec2 = conv(16, 1)

    def __call__(self, x):
        x = self.enc1(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        x = nnx.gelu(x)
        x = self.enc2(x)
        x = nnx.max_pool(x, (2, 2), strides=(2, 2))
        b, h, w, c = x.shape
        q, ind = self.fsq(x.reshape(b, h * w, c))
        q = q.reshape(b, h, w, c)
        x = jnp.repeat(jnp.repeat(q, 2, axis=1), 2, axis=2)
        x = self.dec1(x)
        x = nnx.gelu(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = self.dec2(x)
        return x, ind, jnp.asarray(0.0)


def main(iters=1000, batch=256, dim=32, lr=3e-4, seed=1234):
    rm = build_ref_fsq(dim, seed)
    om = OurFSQModel(dim, nnx.Rngs(seed))
    # conv weights
    convs_t = [m for m in rm.modules() if isinstance(m, nn.Conv2d)]
    convs_j = [om.enc1, om.enc2, om.dec1, om.dec2]
    for t, j in zip(convs_t, convs_j):
        w = t.weight.detach().numpy().copy()
        j.kernel.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        j.bias.value = jnp.asarray(t.bias.detach().numpy().copy())
    # FSQ projections
    rfsq = [m for m in rm.modules() if isinstance(m, ref.FSQ)][0]
    om.fsq.project_in.kernel.value = jnp.asarray(
        rfsq.project_in.weight.detach().numpy().copy().T)
    om.fsq.project_in.bias.value = jnp.asarray(
        rfsq.project_in.bias.detach().numpy().copy())
    om.fsq.project_out.kernel.value = jnp.asarray(
        rfsq.project_out.weight.detach().numpy().copy().T)
    om.fsq.project_out.bias.value = jnp.asarray(
        rfsq.project_out.bias.detach().numpy().copy())

    # train loops (FSQ returns (out, indices) — no aux loss)
    opt_t = torch.optim.AdamW(rm.parameters(), lr=lr)
    ref_losses, ref_ind = [], None
    for x in batches(batch, iters, seed):
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        opt_t.zero_grad()
        out, ind = rm(xt)
        rec = (out - xt).abs().mean()
        rec.backward()
        opt_t.step()
        ref_losses.append(float(rec.detach()))
        ref_ind = ind
    ref_ind = ref_ind.detach().numpy()

    opt_j = nnx.Optimizer(om, optax.adamw(lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            out, ind, _ = m(x)
            rec = jnp.abs(out - x).mean()
            return rec, ind

        (rec, ind), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        opt.update(model, grads)
        return rec, ind

    our_losses, our_ind = [], None
    for x in batches(batch, iters, seed):
        rec, ind = step(om, opt_j, jnp.asarray(x))
        our_losses.append(float(rec))
        our_ind = ind
    our_ind = np.asarray(our_ind)

    tail = max(1, iters // 6)
    codes = int(np.prod(LEVELS))
    result = {
        'reference': {
            'rec_loss': float(np.mean(ref_losses[-tail:])),
            'perplexity': float(metrics.codebook_perplexity(
                jnp.asarray(np.asarray(ref_ind)), codes)),
        },
        'vqtpu': {
            'rec_loss': float(np.mean(our_losses[-tail:])),
            'perplexity': float(metrics.codebook_perplexity(
                jnp.asarray(np.asarray(our_ind)), codes)),
        },
    }
    result['rel_delta'] = {
        k: abs(result['vqtpu'][k] - result['reference'][k])
        / max(result['reference'][k], 1e-9)
        for k in ('rec_loss', 'perplexity')
    }
    print(json.dumps(result, indent=2))
    with open('/root/repo/benchmarks/parity_fsq.json', 'w') as f:
        json.dump(result, f, indent=2)


if __name__ == '__main__':
    main()
