"""Stacked-layer `lax.scan` vs the unrolled Python loop for uniform
ResidualVQ (VERDICT r4 #3 / SURVEY §7.6): same per-layer VQ computation —
layer states stacked along a leading axis, `nnx.merge` inside the scan body —
measured end-to-end (eval fwd + train fwd) and at compile time, q=8 and
q=16, at the BASELINE composite shape (65k tokens, c=1024, d=256).

Also verifies indices parity scan-vs-unrolled on the same batch before
timing. Run on the default (TPU) backend; pass `cpu` to smoke-test.
"""
import sys
import time

sys.path.insert(0, '/root/repo')

if len(sys.argv) > 1 and sys.argv[1] == 'cpu':
    import jax

    jax.config.update('jax_platforms', 'cpu')

import jax
import jax.numpy as jnp
from flax import nnx

import vqtpu
from vqtpu.parallel.group import _fold_keys, _stack_states
from vqtpu.utils import timeit_chained


def build(q, train):
    rvq = vqtpu.ResidualVQ(dim=256, num_quantizers=q, codebook_size=1024,
                           rngs=nnx.Rngs(0))
    rvq.train() if train else rvq.eval()
    return rvq


def scan_forward(rvq, x):
    """The scan variant of the plain-uniform serial loop
    (residual_vq.py __call__): stacked layer states, one compiled body."""
    graphdef, _ = nnx.split(rvq.layers[0])
    states = [nnx.split(l)[1] for l in rvq.layers]
    stacked = _stack_states([_fold_keys(s, i) for i, s in enumerate(states)])

    def step(carry, layer_state):
        residual, out = carry
        m = nnx.merge(graphdef, layer_state)
        quantized, ind, loss = m(residual)
        _, new_state = nnx.split(m)
        return (residual - quantized, out + quantized), (ind, loss, new_state)

    (residual, out), (ind, losses, new_stacked) = jax.lax.scan(
        step, (x, jnp.zeros_like(x)), stacked
    )
    return out, jnp.moveaxis(ind, 0, -1), losses, new_stacked


def bench_pair(q, train, x):
    tag = f'q={q} {"train" if train else "eval"}'

    # ---- unrolled (the shipped module) ----
    rvq = build(q, train)
    graphdef, state = nnx.split(rvq)

    def unrolled(z, x, state):
        state = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(graphdef, state)
        out, ind, losses = m(x)
        if train:
            _, new_state = nnx.split(m)
            return out, ind, losses, jax.tree.leaves(new_state)[:4]
        return out, ind, losses

    t0 = time.time()
    lowered = jax.jit(unrolled).lower(jnp.float32(0), x, state)
    compiled = lowered.compile()
    c_unroll = time.time() - t0
    t_unroll = timeit_chained(unrolled, jnp.float32(0), x, state, lo=2, hi=10)

    # ---- scan ----
    rvq2 = build(q, train)
    graphdef1, _ = nnx.split(rvq2.layers[0])
    states = [nnx.split(l)[1] for l in rvq2.layers]
    stacked = _stack_states([_fold_keys(s, i) for i, s in enumerate(states)])

    def scanned(z, x, stacked):
        stacked = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, stacked)

        def step(carry, layer_state):
            residual, out = carry
            m = nnx.merge(graphdef1, layer_state)
            quantized, ind, loss = m(residual)
            _, new_state = nnx.split(m)
            return ((residual - quantized, out + quantized),
                    (ind, loss, new_state))

        (residual, out), (ind, losses, new_stacked) = jax.lax.scan(
            step, (x, jnp.zeros_like(x)), stacked
        )
        if train:
            return out, ind, losses, jax.tree.leaves(new_stacked)[:4]
        return out, ind, losses

    t0 = time.time()
    lowered = jax.jit(scanned).lower(jnp.float32(0), x, stacked)
    compiled = lowered.compile()
    c_scan = time.time() - t0
    t_scan = timeit_chained(scanned, jnp.float32(0), x, stacked, lo=2, hi=10)

    print(f'{tag:14s}: unrolled {t_unroll*1e3:7.2f} ms (compile {c_unroll:5.1f}s)'
          f' | scan {t_scan*1e3:7.2f} ms (compile {c_scan:5.1f}s)'
          f' | scan/unrolled {t_scan/t_unroll:.3f}')


def check_parity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 256))
    rvq = build(4, False)
    q_s, ind_s, loss_s = rvq(x)
    out, ind, losses, _ = scan_forward(build(4, False), x)
    assert (ind == ind_s).all(), 'indices diverge scan vs unrolled'
    assert jnp.allclose(out, q_s, atol=1e-5)
    print('parity ok (eval indices bit-identical, quantized allclose)')


def main():
    check_parity()
    x = jax.random.normal(jax.random.PRNGKey(0), (32, 2048, 256))  # 65k tokens
    for q in (8, 16):
        bench_pair(q, train=False, x=x)
    bench_pair(8, train=True, x=x)


if __name__ == '__main__':
    main()
