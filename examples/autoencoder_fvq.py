"""FVQ autoencoder example (reference examples/autoencoder_fvq.py): the
codebook is realized through a small transformer bridge (vq_bridge) and
trained with an in-place SGD codebook optimizer.

Note: EMA-free learnable codebooks behind a bridge are prone to
winner-take-all utilization collapse on easy data — the reference's
FVQ needed a hyperparameter hunt on FashionMNIST (upstream issue
#239). This is PARITY, not a vqtpu defect: benchmarks/parity_fvq.py
trains the reference at this exact config with an exact torch mirror
of the bridge (forward delta 1.7e-6) and BOTH frameworks collapse
identically (1/256 codes within 25 iters, rec-loss delta 0.1% —
PARITY_FVQ.json). If utilization collapses on your data, add
codebook_diversity_loss_weight or a threshold_ema_dead_code equivalent.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import jax.numpy as jnp
import optax
from flax import nnx

from vqtpu import VectorQuantize
from vqtpu.models import SimpleQuantizeAutoEncoder, MiniEncoder
from common import train_loop


def main(train_iter=1000, lr=3e-4, dim=32, num_codes=256, seed=1234,
         alpha=10.0, batch_size=256, diversity_weight=0.0):
    rngs = nnx.Rngs(seed)
    # inner width 256 over codebook dim 32 + register tokens: the
    # hyperparameters the reference example found critical
    bridge = MiniEncoder(dim=256, input_dim=dim, depth=1, heads=4,
                         rngs=rngs)
    # rotation_trick=False matches the reference FVQ config
    # (examples/autoencoder_fvq.py:118): with the rotation trick the task
    # gradients bypass the bridge entirely and the codebook collapses
    quantizer = VectorQuantize(
        dim=dim, codebook_size=num_codes,
        vq_bridge=bridge, learnable_codebook=True, ema_update=False,
        rotation_trick=False,
        # --diversity N (e.g. 0.5) counteracts the winner-take-all collapse
        # of the reference-faithful config (default 0.0 keeps parity; see
        # PARITY_FVQ.json — the reference collapses identically)
        codebook_diversity_loss_weight=diversity_weight,
        in_place_codebook_optimizer=optax.sgd(1e-3), rngs=rngs,
    )
    model = SimpleQuantizeAutoEncoder(quantizer, dim=dim, rngs=rngs)

    def loss_from_outputs(outputs, x, alpha):
        out, indices, cmt_loss = outputs
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        return rec + alpha * cmt_loss, rec, cmt_loss, indices

    train_loop(model, loss_from_outputs=loss_from_outputs,
               codebook_size=num_codes, train_iter=train_iter, lr=lr,
               alpha=alpha, batch_size=batch_size, seed=seed)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=256)
    p.add_argument('--diversity', type=float, default=0.0,
                   help='codebook diversity loss weight; 0 = reference-'
                        'faithful (collapses on easy data, PARITY_FVQ.json)')
    a = p.parse_args()
    main(train_iter=a.train_iter, batch_size=a.batch_size,
         diversity_weight=a.diversity)
