"""Component-level breakdown at the GroupedResidualVQ composite shape
(n=65k tokens, c=1024, d=128 per group, g=2, q=4) — the 63-64%-of-floor
envelope from BASELINE.md's round-2 table (VERDICT r2 weak item 2).

Measures, at that exact shape:
  - selection alone: XLA fused vs pipelined Pallas at several block_n
    (n=65k sits below the round-2 n>=2^18 auto-gate; this sweep is the
    small-n evidence the gate was missing)
  - batched-group selection: one (g, n, c, d) einsum+argmax vs two
    sequential calls (groups are independent; MXU sees twice the work in
    one dispatch)
  - lookup alone (take vs one-hot at c=1024)
  - one full ResidualVQ(q=1) eval layer vs its select+take sum: the glue
    cost (residual subtract/accumulate, projections, masking)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/grouped_shape_tpu.py
"""

import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from flax import nnx

N, C, D, G = 1 << 16, 1024, 128, 2


def slope(fn, *args, lo=8, hi=72):
    """Chained-slope timing: fn(carry, *args) -> new carry (full reduction
    of every output must feed the carry — CLAUDE.md methodology)."""
    @functools.partial(jax.jit, static_argnums=0)
    def chained(iters, *args):
        def body(i, acc):
            return fn(acc, *args)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(lo, *args))
    float(chained(hi, *args))
    slopes = []
    for _ in range(5):
        t0 = time.perf_counter(); float(chained(lo, *args))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chained(hi, *args))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (hi - lo))
    return sorted(slopes)[len(slopes) // 2]


def main():
    from bench import detect_specs
    from vqtpu.kernels.distance import (
        _nearest_code_pallas, _prepare_operands, gather_codes,
        nearest_code_xla,
    )

    peak, hbm = detect_specs()
    pass_ms = 2 * N * C * D / (peak * 1e12) * 1e3
    print(f'shape n={N} c={C} d={D}: 1 MXU pass = {pass_ms:.3f} ms; '
          f'4-pass layer floor = {4 * pass_ms:.3f} ms')

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    xg = jax.random.normal(key, (G, N, D), jnp.float32)
    embed = jax.random.normal(jax.random.PRNGKey(1), (C, D), jnp.float32)
    embedg = jax.random.normal(jax.random.PRNGKey(1), (G, C, D), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, C)

    # --- selection alone -------------------------------------------------
    def sel_xla(acc, x, e):
        i = nearest_code_xla(x + acc * 1e-20, e)
        return acc + i.sum().astype(jnp.float32) * 1e-12

    t = slope(sel_xla, x, embed)
    print(f'select XLA          : {t*1e3:7.3f} ms ({pass_ms/(t*1e3)*100:3.0f}% of 1-pass)')

    for bn in (512, 1024, 2048, 4096):
        if bn * C * 4 > 8 * 1024 * 1024:
            continue

        def sel_pallas(acc, x, e, _bn=bn):
            xp, ep, bias, n = _prepare_operands(x + acc * 1e-20, e, 'euclidean', _bn)
            i = _nearest_code_pallas(xp, ep, bias, block_n=_bn, interpret=False)
            return acc + i[:n].sum().astype(jnp.float32) * 1e-12

        try:
            t = slope(sel_pallas, x, embed)
            print(f'select Pallas bn={bn:4d}: {t*1e3:7.3f} ms '
                  f'({pass_ms/(t*1e3)*100:3.0f}% of 1-pass)')
        except Exception as e:  # Mosaic compile failures at VMEM limits
            print(f'select Pallas bn={bn:4d}: FAILED ({type(e).__name__})')

    # --- batched-group selection ----------------------------------------
    def sel_batched(acc, xg, eg):
        xx = xg + acc * 1e-20
        scores = jnp.einsum(
            'gnd,gcd->gnc', xx, eg, preferred_element_type=jnp.float32)
        scores = scores - 0.5 * (eg ** 2).sum(-1)[:, None, :]
        i = jnp.argmax(scores, axis=-1)
        return acc + i.sum().astype(jnp.float32) * 1e-12

    t = slope(sel_batched, xg, embedg)
    print(f'select batched g={G} einsum: {t*1e3:7.3f} ms '
          f'({G*pass_ms/(t*1e3)*100:3.0f}% of {G}-pass)')

    def sel_seq(acc, xg, eg):
        for g in range(G):
            i = nearest_code_xla(xg[g] + acc * 1e-20, eg[g])
            acc = acc + i.sum().astype(jnp.float32) * 1e-12
        return acc

    t = slope(sel_seq, xg, embedg)
    print(f'select 2 separate   : {t*1e3:7.3f} ms ({G*pass_ms/(t*1e3)*100:3.0f}% of {G}-pass)')

    # vmapped Pallas over the group dim (nearest_code vmaps leading dims;
    # whether jax.vmap lifts the pipelined pallas_call is itself part of the
    # experiment — the grid fallback should lift regardless)
    from vqtpu.kernels.distance import nearest_code

    for bn in (1024, 2048):
        def sel_pallas_g(acc, xg, eg, _bn=bn):
            i = nearest_code(xg + acc * 1e-20, eg, backend='pallas',
                             block_n=_bn)
            return acc + i.sum().astype(jnp.float32) * 1e-12

        try:
            t = slope(sel_pallas_g, xg, embedg)
            print(f'select vmap-Pallas bn={bn:4d}: {t*1e3:7.3f} ms '
                  f'({G*pass_ms/(t*1e3)*100:3.0f}% of {G}-pass)')
        except Exception as e:
            print(f'select vmap-Pallas bn={bn:4d}: FAILED ({type(e).__name__})')

    # --- lookup alone ----------------------------------------------------
    def lk_take(acc, e, idx):
        ii = idx + (acc * 0).astype(jnp.int32)
        q = gather_codes(e, ii)                     # c=1024 -> jnp.take
        return acc + q.sum() * 1e-12 + ii.sum().astype(jnp.float32) * 1e-12

    t = slope(lk_take, embed, idx)
    print(f'lookup take         : {t*1e3:7.3f} ms ({3*pass_ms/(t*1e3)*100:3.0f}% of 3-pass credit)')

    def lk_onehot(acc, e, idx):
        ii = idx + (acc * 0).astype(jnp.int32)
        oh = jax.nn.one_hot(ii, C, dtype=jnp.float32)
        q = jnp.einsum('nc,cd->nd', oh, e,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return acc + q.sum() * 1e-12 + ii.sum().astype(jnp.float32) * 1e-12

    t = slope(lk_onehot, embed, idx)
    print(f'lookup one-hot      : {t*1e3:7.3f} ms ({3*pass_ms/(t*1e3)*100:3.0f}% of 3-pass credit)')

    # --- one full eval layer vs its parts --------------------------------
    import vqtpu

    rvq = vqtpu.ResidualVQ(dim=D, num_quantizers=1, codebook_size=C,
                           rngs=nnx.Rngs(0))
    rvq.eval()
    graphdef, state = nnx.split(rvq)

    def layer(acc, x, state):
        state = jax.tree.map(
            lambda a: a + acc * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(graphdef, state)
        q, ind, loss = m(x.reshape(1, N, D))
        return (acc + q.sum() * 1e-12
                + ind.sum().astype(jnp.float32) * 1e-12 + loss.sum() * 0)

    t = slope(layer, x, state)
    print(f'ResidualVQ q=1 layer: {t*1e3:7.3f} ms ({4*pass_ms/(t*1e3)*100:3.0f}% of 4-pass floor)')

    grvq = vqtpu.GroupedResidualVQ(dim=2 * D, groups=G, num_quantizers=4,
                                   codebook_size=C, rngs=nnx.Rngs(0))
    grvq.eval()
    gdef2, state2 = nnx.split(grvq)
    xfull = jax.random.normal(key, (32, 2048, 2 * D))

    def grouped(acc, x, state):
        state = jax.tree.map(
            lambda a: a + acc * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(gdef2, state)
        q, ind, loss = m(x)
        return (acc + q.sum() * 1e-12
                + ind.sum().astype(jnp.float32) * 1e-12 + loss.sum() * 0)

    t = slope(grouped, xfull, state2, lo=2, hi=12)
    floor = 8 * 4 * pass_ms
    print(f'GroupedResidualVQ   : {t*1e3:7.3f} ms ({floor/(t*1e3)*100:3.0f}% of '
          f'{floor:.3f} ms 8-layer floor)')


if __name__ == '__main__':
    main()
