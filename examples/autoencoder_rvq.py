"""ResidualVQ autoencoder (RQ-VAE / SoundStream style — BASELINE.json
config 4: 8 quantizers, kmeans init, shared codebook, stochastic sampling).
The reference has no RVQ example; this follows its example skeleton
(examples/autoencoder.py:49-115)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp
from flax import nnx

from vqtpu import ResidualVQ
from vqtpu.models import SimpleQuantizeAutoEncoder
from common import train_loop


def main(train_iter=1000, lr=3e-4, dim=32, num_codes=256, num_quantizers=8,
         seed=1234, shared_codebook=True, stochastic=True, alpha=10.0,
         batch_size=256):
    rngs = nnx.Rngs(seed)
    model = SimpleQuantizeAutoEncoder(
        ResidualVQ(
            dim=dim,
            num_quantizers=num_quantizers,
            codebook_size=num_codes,
            kmeans_init=True,
            shared_codebook=shared_codebook,
            stochastic_sample_codes=stochastic,
            sample_codebook_temp=0.1,
            rngs=rngs,
        ),
        dim=dim, rngs=rngs,
    )

    def loss_from_outputs(outputs, x, alpha):
        out, indices, cmt_losses = outputs
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        cmt = cmt_losses.sum()
        return rec + alpha * cmt, rec, cmt, indices

    train_loop(model, loss_from_outputs=loss_from_outputs,
               codebook_size=num_codes, train_iter=train_iter, lr=lr,
               alpha=alpha, batch_size=batch_size, seed=seed)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=256)
    p.add_argument('--num_quantizers', type=int, default=8)
    p.add_argument('--num_codes', type=int, default=256)
    args = p.parse_args()
    main(train_iter=args.train_iter, batch_size=args.batch_size,
         num_quantizers=args.num_quantizers, num_codes=args.num_codes)
