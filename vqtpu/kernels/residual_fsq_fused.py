"""Fused ResidualFSQ eval forward (single Pallas sweep).

The XLA composition of the q-layer residual-FSQ chain measures ~26
input-stream-equivalents at q=8, d=4 (BASELINE.md r5): 67% of the runtime
is the per-layer index codec — `codes` has two consumers (the codec and
the residual update), and XLA materializes multi-consumer fusion roots to
HBM instead of recomputing, so every layer pays an extra (n, d) read plus
an (n,) write. Layout restructurings cannot lift this (lane-packing 0.13x,
channel-major 1.04x, both certified in tools/tpu_r5_logs/
fsq_pack_probe.log).

VERDICT (r5, measured on v5e — tools/tpu_r5_logs/rfsq_fused_ab.log,
rfsq_fused_breakdown.log, rfsq_glue_breakdown.log): the kernel itself
beats the XLA loop — 1.23 vs 2.2 ms at q=8, d=4, 4.2M tokens, bit-exact —
but materializing the (N, d) tokens into the (N*d/128, 128) full-lane
input layout costs ~9 ms (the retiling copy runs ~140x off bandwidth;
when a reduce consumes the reshape directly XLA elides it, but a
pallas_call operand forces it). End-to-end 10.4 ms = 0.21x. Transposed
(d, N) variants pencil out to >= parity (2x sublane pad + 3 transposes).
`ResidualFSQ(eval_fused='auto')` therefore keeps the XLA loop; 'on' is
the verified escape hatch for callers whose data already lives packed
(then this path is the measured 1.8x) or future hardware.

The kernel fuses the whole chain — soft clamp, q x (scale, hard-clamp
bound, floor, codec) — into one VMEM-resident sweep:

- The (N, d) token array is viewed as (M, 128) full-lane rows (PACK =
  128/d' tokens per row, d' = d padded to a power-of-two divisor of 128),
  so every elementwise op runs at full VPU lane utilization. The reshape
  is free-ish: TPU HBM layouts of compact arrays are linear, so the view
  is a retiling copy XLA fuses with the producer/consumer.
- Per-dim constants (levels, clamp, basis, per-layer scales) become
  per-LANE patterns, passed as (1, 128)/(q, 128) VMEM-resident inputs.
- The per-token index (sum over d lanes of digit*basis) is built with a
  lane-roll tree (log2(d') rotations), masked to token-start lanes, and
  rolled into its layer slot: layer i of token u lands at lane
  u*d' + (i mod d') of output part i//d' — which makes each part's flat
  layout EXACTLY the (N, d') slot-major order, so the host-side unpack is
  a reshape + concatenate + slice, no transpose.

Reference semantics: residual_fsq.py:49-350 (preserve_symmetry hard-clamp
FSQ stack with levels^-i scales); the in-kernel op order mirrors
vqtpu/quantizers/fsq.py:149-210 expression-for-expression so silicon
results are bit-identical to the unrolled module path (pinned on-chip by
tools/tpu_round5_runbook.sh; interpret-mode tests pin CPU to one
deepest-layer quantum, where XLA fusion FMA differences flip rare
bin-edge indices — see BASELINE.md r5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_dim(d: int) -> int:
    """Smallest power of two >= d that divides 128."""
    assert 1 <= d <= 128, d
    dp = 1
    while dp < d:
        dp *= 2
    return dp


def _kernel(x_ref, lv_ref, clamp_ref, basis_ref, scales_ref,
            qsum_ref, idx_ref, *, num_quantizers: int, dp: int,
            n_parts: int):
    lv = lv_ref[...]                                   # (1, 128)
    clamp = clamp_ref[...]
    basis = basis_ref[...]

    x = x_ref[...]
    # soft input clamp: tanh(x / c) * c (residual_fsq.py:166-168)
    z = jnp.tanh(x / clamp) * clamp
    residual = z.astype(jnp.float32)
    qsum = jnp.zeros_like(residual)
    parts = [jnp.zeros_like(residual) for _ in range(n_parts)]

    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    at_token_start = (lane % dp) == 0

    for i in range(num_quantizers):
        s = scales_ref[i:i + 1, :]                     # (1, 128)
        zi = residual / s
        # symmetry-preserving hard-clamp bound (fsq.py:149-157)
        bounded = jnp.clip(zi, -1.0, 1.0)
        bracket = jnp.floor((lv - 1.0) * (bounded + 1.0) / 2.0 + 0.5)
        codes = (2.0 / (lv - 1.0)) * bracket - 1.0
        quantized = codes * s
        residual = residual - quantized
        qsum = qsum + quantized

        # index codec, mirroring fsq.codes_to_indices (fsq.py:180-210):
        # zs = (codes + 1) / (2 / (L - 1)); ind = round(sum_d zs * basis)
        w = ((codes + 1.0) / (2.0 / (lv - 1.0))) * basis
        k = 1
        while k < dp:                                  # roll tree: lane l
            w = w + pltpu.roll(w, shift=128 - k, axis=1)   # += w[l + k]
            k *= 2
        tok = jnp.where(at_token_start, w, 0.0)
        slot = i % dp
        if slot:
            tok = pltpu.roll(tok, shift=slot, axis=1)
        parts[i // dp] = parts[i // dp] + tok

    qsum_ref[...] = qsum
    for p in range(n_parts):
        idx_ref[p, :, :] = jnp.round(parts[p]).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=('levels', 'clamp', 'num_quantizers', 'block_rows',
                     'interpret'),
)
def fused_residual_fsq_eval(
    x: jax.Array,
    scales: jax.Array,
    *,
    levels: tuple[int, ...],
    clamp: tuple[float, ...],
    num_quantizers: int,
    block_rows: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Eval forward of the preserve-symmetry hard-clamp residual-FSQ stack.

    x: (..., d) f32 tokens (pre-soft-clamp). scales: (q, d) f32, the
    module's `_scales()`. Returns (quantized (..., d) f32 in x.dtype,
    indices (..., q) int32), matching the unrolled module loop.
    """
    q = num_quantizers
    d = len(levels)
    lead = x.shape[:-1]
    assert x.shape[-1] == d and scales.shape == (q, d)

    dp = _pad_dim(d)
    pack = 128 // dp
    n_parts = -(-q // dp)

    n = int(np.prod(lead)) if lead else 1
    xt = x.reshape(n, d).astype(jnp.float32)
    if dp != d:
        xt = jnp.pad(xt, ((0, 0), (0, dp - d)))

    rows = -(-n // pack)
    rows_pad = -(-rows // block_rows) * block_rows
    n_pad = rows_pad * pack
    if n_pad != n:
        xt = jnp.pad(xt, ((0, n_pad - n), (0, 0)))
    xp = xt.reshape(rows_pad, 128)

    def lanes(vals, fill):
        v = np.full(dp, fill, np.float32)
        v[:d] = np.asarray(vals, np.float32)
        return jnp.asarray(np.tile(v, pack))[None, :]  # (1, 128)

    lv_p = lanes(levels, 2.0)          # pad level 2 keeps 2/(L-1) finite
    clamp_p = lanes(clamp, 1.0)
    basis = np.cumprod(np.concatenate([[1.0], np.asarray(levels[:-1],
                                                         np.float64)]))
    basis_p = lanes(basis, 0.0)        # pad lanes contribute 0 to indices
    scales_p = jnp.tile(
        jnp.pad(scales.astype(jnp.float32), ((0, 0), (0, dp - d)),
                constant_values=1.0),
        (1, pack),
    )                                   # (q, 128)

    grid = (rows_pad // block_rows,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    qsum_p, idx_p = pl.pallas_call(
        functools.partial(_kernel, num_quantizers=q, dp=dp,
                          n_parts=n_parts),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
            full((1, 128)), full((1, 128)), full((1, 128)),
            full((q, 128)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
            pl.BlockSpec((n_parts, block_rows, 128), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_parts, rows_pad, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
        ),
        interpret=interpret,
    )(xp, lv_p, clamp_p, basis_p, scales_p)

    qsum = qsum_p.reshape(n_pad, dp)[:n, :d].astype(x.dtype)
    # part j's flat layout is (n_pad, dp) slot-major: token u, layer
    # j*dp + slot at [u, slot]
    idx = jnp.concatenate(
        [idx_p[j].reshape(n_pad, dp) for j in range(n_parts)], axis=-1,
    )[:n, :q]
    return qsum.reshape(*lead, d), idx.reshape(*lead, q)
