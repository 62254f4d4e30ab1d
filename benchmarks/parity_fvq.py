"""FVQ (vq_bridge) collapse-dynamics parity: vqtpu vs the torch reference.

Round-1 shipped the FVQ example with a note that the config collapses;
VERDICT r1 #6 asks for evidence: train the reference FVQ configuration
(examples/autoencoder_fvq.py:40-150 — learnable codebook behind a 1-depth
transformer bridge at inner width 256 with 2 memory tokens, in-place SGD
codebook optimizer, rotation trick OFF) side by side with vqtpu at identical
weights/data/optimizer, and record the UTILIZATION TRAJECTORY of both.

x-transformers is not installed in this image, so the bridge used on the
torch side is an exact architectural mirror of vqtpu.models.MiniEncoder
(pre-norm block, memory tokens, bias-free in/out projections — the same
hyperparameters the reference example credits as critical), with weights
copied from the jax side. Both frameworks therefore run the SAME function.

Usage: python benchmarks/parity_fvq.py [--iters 1000] [--batch 256]
Writes PARITY_FVQ.json at the repo root.
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

import vqtpu
from vqtpu.core import metrics
from vqtpu.models import MiniEncoder

from parity_vs_reference import (  # noqa: E402
    batches, build_ref_model, copy_weights, OurModel,
)


# --------------------------------------------------------------------------
# torch mirror of vqtpu.models.MiniEncoder (pre-norm, memory tokens,
# bias-free in/out projections) so both frameworks run the same bridge
# --------------------------------------------------------------------------

class TorchBridge(nn.Module):
    def __init__(self, dim=256, input_dim=32, heads=4, num_memory_tokens=2):
        super().__init__()
        self.mem = nn.Parameter(torch.zeros(num_memory_tokens, dim))
        self.proj_in = nn.Linear(input_dim, dim, bias=False)
        self.proj_out = nn.Linear(dim, input_dim, bias=False)
        # eps=1e-6 matches flax LayerNorm (torch default 1e-5 diverges
        # visibly on the small-variance memory tokens)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.ff1 = nn.Linear(dim, dim * 4)
        self.ff2 = nn.Linear(dim * 4, dim)
        self.act = nn.GELU(approximate='tanh')   # jax.nn.gelu default
        self.n_mem = num_memory_tokens

    def forward(self, x):                         # (h, c, d_in)
        x = self.proj_in(x)
        mem = self.mem.unsqueeze(0).expand(x.shape[0], -1, -1)
        x = torch.cat((mem, x), dim=1)
        h = self.norm1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.norm2(x)
        x = x + self.ff2(self.act(self.ff1(h)))
        x = x[:, self.n_mem:]
        return self.proj_out(x)


def copy_bridge(jax_bridge: MiniEncoder, t: TorchBridge):
    """jax MiniEncoder weights -> torch mirror (Linear kernels transpose;
    MHA kernels reshape from (in, heads, hd) / (heads, hd, out))."""
    def n(x):
        return np.array(x)

    with torch.no_grad():
        t.mem.copy_(torch.from_numpy(n(jax_bridge.memory_tokens[...])))
        t.proj_in.weight.copy_(
            torch.from_numpy(n(jax_bridge.proj_in.kernel[...]).T))
        t.proj_out.weight.copy_(
            torch.from_numpy(n(jax_bridge.proj_out.kernel[...]).T))
        blk = jax_bridge.blocks[0]
        t.norm1.weight.copy_(torch.from_numpy(n(blk.norm1.scale[...])))
        t.norm1.bias.copy_(torch.from_numpy(n(blk.norm1.bias[...])))
        t.norm2.weight.copy_(torch.from_numpy(n(blk.norm2.scale[...])))
        t.norm2.bias.copy_(torch.from_numpy(n(blk.norm2.bias[...])))
        t.ff1.weight.copy_(torch.from_numpy(n(blk.ff1.kernel[...]).T))
        t.ff1.bias.copy_(torch.from_numpy(n(blk.ff1.bias[...])))
        t.ff2.weight.copy_(torch.from_numpy(n(blk.ff2.kernel[...]).T))
        t.ff2.bias.copy_(torch.from_numpy(n(blk.ff2.bias[...])))

        a = blk.attn
        dim = t.norm1.weight.shape[0]
        wq = n(a.query.kernel[...]).reshape(dim, dim).T     # (E, E)
        wk = n(a.key.kernel[...]).reshape(dim, dim).T
        wv = n(a.value.kernel[...]).reshape(dim, dim).T
        t.attn.in_proj_weight.copy_(
            torch.from_numpy(np.concatenate([wq, wk, wv], axis=0)))
        bq = n(a.query.bias[...]).reshape(dim)
        bk = n(a.key.bias[...]).reshape(dim)
        bv = n(a.value.bias[...]).reshape(dim)
        t.attn.in_proj_bias.copy_(
            torch.from_numpy(np.concatenate([bq, bk, bv], axis=0)))
        t.attn.out_proj.weight.copy_(
            torch.from_numpy(n(a.out.kernel[...]).reshape(dim, dim).T))
        t.attn.out_proj.bias.copy_(
            torch.from_numpy(n(a.out.bias[...]).reshape(dim)))


def check_bridge_parity(jax_bridge, torch_bridge, dim_in):
    x = np.random.RandomState(0).randn(1, 16, dim_in).astype(np.float32)
    yj = np.asarray(jax_bridge(jnp.asarray(x)))
    with torch.no_grad():
        yt = torch_bridge(torch.from_numpy(x)).numpy()
    delta = np.abs(yj - yt).max()
    assert delta < 2e-5, f'bridge mirror mismatch: {delta}'
    return float(delta)


# --------------------------------------------------------------------------

def fvq_kwargs_ref(bridge):
    return dict(
        vq_bridge=bridge,
        learnable_codebook=True,
        ema_update=False,
        rotation_trick=False,
        in_place_codebook_optimizer=lambda *a, **k: torch.optim.SGD(
            *a, **k, lr=1e-3),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=1000)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--dim', type=int, default=32)
    ap.add_argument('--codes', type=int, default=256)
    ap.add_argument('--vq_dim', type=int, default=256)
    ap.add_argument('--lr', type=float, default=3e-4)
    ap.add_argument('--alpha', type=float, default=10.0)
    ap.add_argument('--seed', type=int, default=1234)
    ap.add_argument('--log_every', type=int, default=50)
    ap.add_argument('--out', type=str, default='/root/repo/PARITY_FVQ.json')
    args = ap.parse_args()

    class OurFVQModel(OurModel):
        def __init__(self, dim, codebook_size, rngs, bridge):
            conv = lambda cin, cout: nnx.Conv(cin, cout, (3, 3), padding=1,
                                              rngs=rngs)
            self.enc1 = conv(1, 16)
            self.enc2 = conv(16, 32)
            self.vq = vqtpu.VectorQuantize(
                dim=dim, codebook_size=codebook_size,
                vq_bridge=bridge, learnable_codebook=True, ema_update=False,
                rotation_trick=False,
                in_place_codebook_optimizer=optax.sgd(1e-3), rngs=rngs,
            )
            self.dec1 = conv(32, 16)
            self.dec2 = conv(16, 1)

    rngs = nnx.Rngs(args.seed)
    jax_bridge = MiniEncoder(dim=args.vq_dim, input_dim=args.dim, depth=1,
                             heads=4, rngs=rngs)
    our_model = OurFVQModel(args.dim, args.codes, rngs, jax_bridge)

    torch_bridge = TorchBridge(dim=args.vq_dim, input_dim=args.dim)
    copy_bridge(jax_bridge, torch_bridge)
    bridge_delta = check_bridge_parity(jax_bridge, torch_bridge, args.dim)
    print(f'bridge mirror max delta: {bridge_delta:.2e}')

    torch.manual_seed(args.seed)
    ref_model = build_ref_model(args.dim, args.codes, args.seed)
    # swap the plain VQ for the FVQ one (ref Sequential stores fns in a
    # ModuleList, utils.py:48)
    for i, m in enumerate(ref_model.fns):
        if isinstance(m, ref.VectorQuantize):
            ref_model.fns[i] = ref.VectorQuantize(
                dim=args.dim, codebook_size=args.codes,
                accept_image_fmap=True, **fvq_kwargs_ref(torch_bridge),
            )
    copy_weights(ref_model, our_model)

    # --- train both, recording utilization/perplexity trajectories --------
    def traj_record(ind, codes):
        return (
            float(metrics.codebook_perplexity(jnp.asarray(ind), codes)),
            float(metrics.codebook_utilization(jnp.asarray(ind), codes)),
        )

    # torch side
    opt = torch.optim.AdamW(ref_model.parameters(), lr=args.lr)
    ref_traj, ref_losses = [], []
    t0 = time.time()
    for it, x in enumerate(batches(args.batch, args.iters, args.seed)):
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        opt.zero_grad()
        out, ind, cmt = ref_model(xt)
        rec = (out.clamp(-1, 1) - xt).abs().mean()
        (rec + args.alpha * cmt).backward()
        opt.step()
        ref_losses.append(float(rec))
        if (it + 1) % args.log_every == 0:
            ref_traj.append((it + 1,) + traj_record(
                ind.detach().numpy(), args.codes))
    t_ref = time.time() - t0

    # jax side
    jopt = nnx.Optimizer(our_model, optax.adamw(args.lr), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            out, ind, cmt = m(x)
            rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
            return rec + args.alpha * cmt, (rec, ind)

        (_, (rec, ind)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        opt.update(model, grads)
        return rec, ind

    our_traj, our_losses = [], []
    t0 = time.time()
    for it, x in enumerate(batches(args.batch, args.iters, args.seed)):
        rec, ind = step(our_model, jopt, jnp.asarray(x))
        our_losses.append(float(rec))
        if (it + 1) % args.log_every == 0:
            our_traj.append((it + 1,) + traj_record(
                np.asarray(ind), args.codes))
    t_ours = time.time() - t0

    tail = max(1, args.iters // 6)
    result = {
        'config': {k: v for k, v in vars(args).items()},
        'bridge_mirror_max_delta': bridge_delta,
        'reference': {
            'rec_loss': float(np.mean(ref_losses[-tail:])),
            'trajectory_iter_pplx_util': ref_traj,
            'wall_s': t_ref,
        },
        'vqtpu': {
            'rec_loss': float(np.mean(our_losses[-tail:])),
            'trajectory_iter_pplx_util': our_traj,
            'wall_s': t_ours,
        },
    }
    print(json.dumps(result, indent=2))
    with open(args.out, 'w') as f:
        json.dump(result, f, indent=2)


if __name__ == '__main__':
    main()
