"""Shared training skeleton for the example scripts (mirrors the loop shape
of reference examples/autoencoder.py:49-115: AdamW, L1 reconstruction +
alpha * aux loss, active-code% metric)."""

from __future__ import annotations

import os
import sys

# allow running `python examples/foo.py` from anywhere without installing
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

import time
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from vqtpu.core import metrics
from vqtpu.models import image_batches


def train_loop(
    model: nnx.Module,
    *,
    loss_from_outputs: Callable,
    codebook_size: int,
    train_iter: int = 1000,
    lr: float = 3e-4,
    alpha: float = 10.0,
    batch_size: int = 256,
    seed: int = 1234,
    log_every: int = 50,
):
    """loss_from_outputs(outputs, x) -> (total_loss, rec_loss, aux_loss,
    indices)."""
    opt = nnx.Optimizer(model, optax.adamw(lr), wrt=nnx.Param)
    data = image_batches(batch_size=batch_size, seed=seed)

    @nnx.jit
    def step(model, opt, x):
        def loss_fn(m):
            outputs = m(x)
            total, rec, aux, indices = loss_from_outputs(outputs, x, alpha)
            return total, (rec, aux, indices)

        (_, (rec, aux, indices)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True
        )(model)
        opt.update(model, grads)
        return rec, aux, indices

    t0 = time.time()
    for it in range(train_iter):
        x = jnp.asarray(next(data))
        rec, aux, indices = step(model, opt, x)

        if it % log_every == 0 or it == train_iter - 1:
            active = float(
                metrics.codebook_utilization(indices, codebook_size)) * 100
            pplx = float(
                metrics.codebook_perplexity(indices, codebook_size))
            print(
                f'iter {it:5d} | rec loss: {float(rec):.3f} | '
                f'aux loss: {float(aux):.3f} | active %: {active:.1f} | '
                f'perplexity: {pplx:.1f} | '
                f'{time.time() - t0:.1f}s'
            )
    return model
