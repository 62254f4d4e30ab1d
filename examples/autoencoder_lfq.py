"""LFQ autoencoder example (reference examples/autoencoder_lfq.py;
codebook 256 = 2^8, entropy_loss_weight 0.02, diversity_gamma 1)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import jax.numpy as jnp
from flax import nnx

from vqtpu import LFQ
from vqtpu.models import SimpleQuantizeAutoEncoder
from common import train_loop


def main(train_iter=1000, lr=3e-4, dim=32, num_codes=256, seed=1234,
         entropy_loss_weight=0.02, diversity_gamma=1.0, alpha=10.0,
         batch_size=256):
    rngs = nnx.Rngs(seed)
    quantizer = LFQ(
        dim=dim, codebook_size=num_codes,
        entropy_loss_weight=entropy_loss_weight,
        diversity_gamma=diversity_gamma, rngs=rngs,
    )
    model = SimpleQuantizeAutoEncoder(quantizer, dim=dim, rngs=rngs)

    def loss_from_outputs(outputs, x, alpha):
        out, indices, entropy_aux_loss = outputs
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        return rec + alpha * entropy_aux_loss, rec, entropy_aux_loss, indices

    train_loop(model, loss_from_outputs=loss_from_outputs,
               codebook_size=num_codes, train_iter=train_iter, lr=lr,
               alpha=alpha, batch_size=batch_size, seed=seed)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=256)
    p.add_argument('--num_codes', type=int, default=256)
    a = p.parse_args()
    main(train_iter=a.train_iter, batch_size=a.batch_size,
         num_codes=a.num_codes)
