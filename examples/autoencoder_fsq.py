"""FSQ autoencoder example (reference examples/autoencoder_fsq.py; default
levels [8, 6, 5])."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import jax.numpy as jnp
from flax import nnx

from vqtpu import FSQ
from vqtpu.models import SimpleQuantizeAutoEncoder
from common import train_loop


def main(train_iter=1000, lr=3e-4, dim=32, levels=(8, 6, 5), seed=1234,
         alpha=10.0, batch_size=256):
    import math
    rngs = nnx.Rngs(seed)
    quantizer = FSQ(list(levels), dim=dim, rngs=rngs)
    model = SimpleQuantizeAutoEncoder(quantizer, dim=dim, rngs=rngs)

    def loss_from_outputs(outputs, x, alpha):
        out, indices = outputs
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        return rec, rec, jnp.asarray(0.0), indices

    train_loop(model, loss_from_outputs=loss_from_outputs,
               codebook_size=math.prod(levels), train_iter=train_iter,
               lr=lr, alpha=alpha, batch_size=batch_size, seed=seed)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=256)
    p.add_argument('--levels', type=int, nargs='+', default=[8, 6, 5])
    a = p.parse_args()
    main(train_iter=a.train_iter, batch_size=a.batch_size,
         levels=tuple(a.levels))
