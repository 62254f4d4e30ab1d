"""Tensor-parallel large-codebook training example.

Trains a conv autoencoder whose `VectorQuantize` bottleneck has a codebook
too large to replicate (default 65536 rows), row-sharded over a `code` mesh
axis while the batch shards over `data` — the full 2D-mesh training path
(`code_axis`, kmeans init + dead-code expiry on sharded rows, psum'd EMA).

The reference keeps the whole codebook on every rank
(vector_quantize_pytorch.py:603-607); this is the capability it doesn't
have. With a single real accelerator, run on the virtual CPU mesh:

    python examples/tp_large_codebook.py                 # 2x4 CPU mesh
    python examples/tp_large_codebook.py --data 1 --code 4

On a real pod slice, drop --force_cpu and size the mesh to the slice.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time


def main(train_iter=200, lr=3e-4, dim=64, num_codes=65536, seed=0,
         alpha=10.0, batch_size=256, data=2, code=4, force_cpu=True):
    if force_cpu:
        import jax

        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_num_cpu_devices', data * code)

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from vqtpu import VectorQuantize
    from vqtpu.core import metrics
    from vqtpu.models import SimpleQuantizeAutoEncoder, image_batches
    from vqtpu.parallel import TensorParallelTrainer, make_mesh

    assert num_codes % code == 0
    mesh = make_mesh(('data', 'code'), shape=(data, code))
    rngs = nnx.Rngs(seed)
    model = SimpleQuantizeAutoEncoder(
        VectorQuantize(
            dim=dim, codebook_size=num_codes,
            sync_axis='data', code_axis='code',
            kmeans_init=True, threshold_ema_dead_code=0.25,
            rngs=rngs,
        ),
        dim=dim, rngs=rngs,
    )

    def loss_fn(m, x):
        out, indices, cmt = m(x)
        rec = jnp.abs(jnp.clip(out, -1, 1) - x).mean()
        return rec + alpha * cmt

    trainer = TensorParallelTrainer(model, optax.adamw(lr), loss_fn, mesh)
    data_iter = image_batches(batch_size=batch_size, seed=seed)

    print(f'mesh {mesh.shape} | codebook {num_codes} rows '
          f'({num_codes // code} per code-shard)')
    t0 = time.time()
    for it in range(train_iter):
        x = jnp.asarray(next(data_iter))
        loss = trainer.step(x)
        if it % 20 == 0 or it == train_iter - 1:
            print(f'iter {it:5d} | loss {float(loss):.4f} | '
                  f'{time.time() - t0:.1f}s')

    cs = model.quantizer._codebook.cluster_size[...]
    pplx = float(metrics.ema_perplexity(cs)[0])
    print(f'done: EMA perplexity {pplx:.1f} over {num_codes} sharded codes')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--train_iter', type=int, default=200)
    p.add_argument('--num_codes', type=int, default=65536)
    p.add_argument('--batch_size', type=int, default=256)
    p.add_argument('--data', type=int, default=2)
    p.add_argument('--code', type=int, default=4)
    p.add_argument('--no_force_cpu', action='store_true')
    a = p.parse_args()
    main(train_iter=a.train_iter, num_codes=a.num_codes,
         batch_size=a.batch_size, data=a.data, code=a.code,
         force_cpu=not a.no_force_cpu)
