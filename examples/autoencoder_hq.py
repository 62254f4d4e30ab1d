"""HierarchicalVQ autoencoder example (reference examples/autoencoder_hq.py;
scales (1, 2, 4, 7), codebook 512, kmeans init, quant_resi 0.5)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import jax.numpy as jnp
from flax import nnx

from vqtpu import HierarchicalVQ
from vqtpu.models.autoencoder import ConvEncoder, ConvDecoder
from vqtpu.core.module import ModeModule
from common import train_loop


class HQAutoEncoder(ModeModule):
    """HierarchicalVQ consumes channel-first feature maps, so this model
    transposes around the quantizer."""

    def __init__(self, dim, num_codes, scales, rngs):
        self.encoder = ConvEncoder(dim, rngs=rngs)
        self.hq = HierarchicalVQ(
            dim=dim, codebook_size=num_codes, scales=scales,
            accept_image_fmap=True, kmeans_init=True, quant_resi=0.5,
            share_quant_resi=1, rngs=rngs,
        )
        self.decoder = ConvDecoder(dim, rngs=rngs)

    def __call__(self, x):
        z = self.encoder(x)                       # (b, h, w, d)
        fmap = jnp.transpose(z, (0, 3, 1, 2))     # (b, d, h, w)
        recon, indices, commit = self.hq(fmap)
        z = jnp.transpose(recon, (0, 2, 3, 1))
        return self.decoder(z), indices, commit


def main(train_iter=1000, lr=3e-4, dim=32, num_codes=512, seed=1234,
         scales=(1, 2, 4, 7), alpha=10.0, batch_size=256):
    rngs = nnx.Rngs(seed)
    model = HQAutoEncoder(dim, num_codes, scales, rngs)

    def loss_from_outputs(outputs, x, alpha):
        out, indices, commit_loss = outputs
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        return rec + alpha * commit_loss, rec, commit_loss, indices[-1]

    train_loop(model, loss_from_outputs=loss_from_outputs,
               codebook_size=num_codes, train_iter=train_iter, lr=lr,
               alpha=alpha, batch_size=batch_size, seed=seed)


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=256)
    a = p.parse_args()
    main(train_iter=a.train_iter, batch_size=a.batch_size)
