"""FSP autoencoder example (reference examples/autoencoder_fsp.py; levels
[8, 6, 5], tanh activation, quantize_rate 0.5, vector_norm var_tanh)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import jax.numpy as jnp
from flax import nnx

from vqtpu import FSP
from vqtpu.models import SimpleQuantizeAutoEncoder
from common import train_loop


def main(train_iter=1000, lr=3e-4, dim=32, levels=(8, 6, 5), seed=1234,
         act_name='tanh', quantize_rate=0.5, vector_norm='var_tanh',
         alpha=10.0, batch_size=256):
    rngs = nnx.Rngs(seed)
    quantizer = FSP(
        list(levels), dim=dim, act_name=act_name,
        quantize_rate=quantize_rate, vector_norm=vector_norm, rngs=rngs,
    )
    model = SimpleQuantizeAutoEncoder(quantizer, dim=dim, rngs=rngs)

    def loss_from_outputs(outputs, x, alpha):
        out, indices, norm_loss, _info = outputs
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        return rec + norm_loss, rec, norm_loss, indices

    train_loop(model, loss_from_outputs=loss_from_outputs,
               codebook_size=math.prod(levels), train_iter=train_iter,
               lr=lr, alpha=alpha, batch_size=batch_size, seed=seed)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=256)
    a = p.parse_args()
    main(train_iter=a.train_iter, batch_size=a.batch_size)
