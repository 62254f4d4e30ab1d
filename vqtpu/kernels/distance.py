"""Fused nearest-code selection + code lookup: the framework's hot path.

The hot loop of every euclidean/cosine codebook lookup is
    score[n, c] = x_n . c_c + bias_c          (bias = -||c||^2/2 for L2)
    ind[n]      = argmax_c score              ;  quant[n] = codebook[ind[n]]
(reference vector_quantize_pytorch.py:58-62,729-781).

Two implementations, benchmarked head-to-head on TPU v5e at the BASELINE
shape (n=1M tokens, c=512, d=256, f32):

1. `backend='xla'` (default): a fused XLA formulation. Key TPU insights
   baked in:
   - XLA fuses matmul + argmax so the (n, c) score matrix never round-trips
     HBM; measured at ~95% of the 1-MXU-pass roofline for selection.
   - `jnp.take` (row gather) is the SLOW path on TPU (~3.5x the memory
     floor); the lookup is instead a one-hot matmul at Precision.HIGHEST,
     which is *bit-exact* (one-hot entries are exact in every pass of the
     3xbf16 decomposition) and ~matches the take time while fusing better
     into surrounding graphs.

2. `backend='pallas'`: a manually double-buffered Pallas kernel — x streams
   HBM->VMEM in chunks overlapped with MXU scoring, codebook resident in
   VMEM, running argmax via a where/iota epilogue. The auto winner at
   512<=c<=1024, d<=256, n>=2^18 (measured round 2); the tiled variant
   covers codebooks beyond VMEM as an exact fallback. (The sharded-codebook
   path, vqtpu.parallel.shard.sharded_nearest_code, composes per-shard
   `nearest_code_xla` with an elementwise winner reduction — XLA wins at
   per-shard scale.)

Both paths agree exactly with `nearest_code_xla` (first-index tie-break);
the test-suite asserts index equality in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.utils import cdist_sq


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# XLA formulations
# ---------------------------------------------------------------------------

def nearest_code_xla(
    x: jax.Array,
    embed: jax.Array,
    metric: str = 'euclidean',
    *,
    return_best: bool = False,
):
    """(n, d), (c, d) -> (n,) int32 indices of the nearest code.

    `return_best=True` additionally returns each token's winning score
    (higher = better; for euclidean this is -cdist^2). The values are
    EXACTLY the ones the argmax reduced, so a row-sharded caller can
    compare winners across shards without the score-recompute that r1's
    sharded path paid (per-column scores are identical regardless of which
    shard computes them — same formulation, same operands)."""
    if metric == 'cosine':
        scores = jnp.einsum('nd,cd->nc', x, embed, preferred_element_type=jnp.float32)
    else:
        scores = -cdist_sq(x, embed)
    if not return_best:
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return argmax_first_with_best(scores)


def argmax_first_with_best(scores: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., c) scores -> (argmax idx int32, best score), first-index
    tie-break, as ONE variadic reduce over the last axis.

    Separate jnp.max + jnp.argmax calls are two reductions, which breaks
    XLA's matmul+reduce fusion and materializes the (n, c) score matrix
    (measured +80% on the sharded path at n=1M, c=4096). jnp.argmax itself
    lowers to exactly this variadic reduce — we just keep both outputs.
    Selection is non-differentiable (gradients route via STE/rotation at the
    quantizer layer), and lax.reduce's custom computation has no JVP — the
    tape is cut here."""
    axis = scores.ndim - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, axis)

    def reducer(a, b):
        av, ai = a
        bv, bi = b
        better = (bv > av) | ((bv == av) & (bi < ai))
        return (jnp.where(better, bv, av), jnp.where(better, bi, ai))

    best, idx = jax.lax.reduce(
        (jax.lax.stop_gradient(scores), iota),
        (jnp.float32(-jnp.inf), jnp.int32(2 ** 30)),
        reducer,
        (axis,),
    )
    return idx.astype(jnp.int32), best


def gather_codes(
    embed: jax.Array,
    indices: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """codebook row lookup: (c, d), (...,) -> (..., d).

    Two formulations, both exact, crossover measured on v5e
    (benchmarks/gather_sweep_tpu.py / pipeline_variants_tpu.py, round 2):

    - one-hot matmul: MXU-bound, cost LINEAR in c (3 bf16 passes for a f32
      codebook at HIGHEST — bit-exact since the one-hot operand is exact in
      every decomposition pass; 1 pass for a bf16 codebook). Fuses well.
    - jnp.take: memory-bound row gather, cost ~FLAT in c (~60% of the HBM
      floor; 4.4 ms for 1M x 256 rows regardless of c).

    Equating the two: one-hot wins below c ~= 512 * (3 / passes); take wins
    above (2-4x faster at c=1024-8192 — round 1 shipped one-hot up to 8192,
    which was wrong). Off-TPU always takes the gather.
    """
    c = embed.shape[0]
    if embed.dtype == jnp.bfloat16:
        # bf16 operands are exact under DEFAULT (native 1-pass MXU with f32
        # accumulation); HIGHEST makes XLA upcast and run ~3x slower
        # (measured 4.2 vs 1.5 ms at c=512, benchmarks/decode_tpu.py)
        precision = jax.lax.Precision.DEFAULT
        passes = 1
    else:
        passes = 3 if (
            embed.dtype == jnp.float32
            and precision == jax.lax.Precision.HIGHEST
        ) else 1
    crossover = 512 * 3 // passes
    if jax.default_backend() != 'tpu' or c > crossover:
        return jnp.take(embed, indices, axis=0)
    flat = indices.reshape(-1)
    one_hot = jax.nn.one_hot(flat, c, dtype=embed.dtype)
    out = jnp.einsum(
        'nc,cd->nd', one_hot, embed,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.reshape(*indices.shape, embed.shape[-1]).astype(embed.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _tiled_select_kernel(
    x_ref, c_ref, bias_ref, idx_ref, best_ref, bidx_ref, *, c_tile: int
):
    """Large-codebook selection: grid = (token blocks, codebook tiles); the
    codebook streams through VMEM tile by tile (Mosaic double-buffers the
    tile loads) while a running (best score, best index) pair persists in
    scratch across the tile dimension. Tie-break: strict improvement across
    tiles + first-index within a tile == global first-index argmax.

    The carry lives lane-packed as (block_n/128, 128) — a (block_n, 1) VMEM
    scratch pads to 128 lanes (128x memory: 2MB wasted per buffer at
    block_n=4096, which matters against the 16MB VMEM budget now that the
    r4 blocking grows block_n)."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    rows = best_ref.shape[0]

    scores = jax.lax.dot_general(
        x_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]

    local_best = jnp.max(scores, axis=1, keepdims=True)          # (bn, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    local_idx = jnp.min(
        jnp.where(scores >= local_best, iota + j * c_tile, jnp.int32(2**30)),
        axis=1, keepdims=True,
    )
    local_best = local_best.reshape(rows, 128)
    local_idx = local_idx.reshape(rows, 128)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref[:], -jnp.inf)
        bidx_ref[:] = jnp.zeros_like(bidx_ref[:])

    better = local_best > best_ref[:]
    bidx_ref[:] = jnp.where(better, local_idx, bidx_ref[:])
    best_ref[:] = jnp.where(better, local_best, best_ref[:])

    @pl.when(j == n_j - 1)
    def _():
        idx_ref[:] = bidx_ref[:]


@functools.partial(
    jax.jit, static_argnames=('block_n', 'c_tile', 'interpret')
)
def _nearest_code_pallas_tiled(
    x, embed, bias, *, block_n: int, c_tile: int, interpret: bool
):
    """Selection for codebooks too large for VMEM residence: (n, d) vs
    (c, d) with c tiled. Caller guarantees n % block_n == 0, c % c_tile == 0,
    d padded to lanes."""
    n, d = x.shape
    c = embed.shape[0]
    rows = block_n // 128

    idx = pl.pallas_call(
        functools.partial(_tiled_select_kernel, c_tile=c_tile),
        grid=(n // block_n, c // c_tile),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // block_n * rows, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * d,
            bytes_accessed=n * d * 4 + (n // block_n) * c * d * 4 + n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, embed, bias)
    return idx.reshape(n)

def _select_epilogue(scores: jax.Array, num_codes_padded: int) -> jax.Array:
    """Running argmax with first-index tie-break: max, then min index among
    maxima (lowers better on the VPU than jnp.argmax)."""
    best = jnp.max(scores, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    return jnp.min(
        jnp.where(scores >= best, iota, num_codes_padded + 1),
        axis=1, keepdims=True,
    )


def _grid_select_kernel(x_ref, c_ref, bias_ref, idx_ref, *, c_padded: int):
    """Simple grid kernel (codebook resident in VMEM); used for interpreter
    mode and as the vmap-friendly fallback."""
    scores = jax.lax.dot_general(
        x_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:]
    idx = _select_epilogue(scores, c_padded)
    idx_ref[:] = idx.reshape(idx_ref.shape)


def _pipelined_select_kernel(
    x_hbm, c_ref, bias_ref, idx_hbm, *, block_n: int, c_padded: int
):
    """Double-buffered pipeline: x chunks stream HBM->VMEM overlapped with
    the MXU scoring of the previous chunk (pallas_guide.md double-buffering
    pattern). Indices stage through VMEM lane-packed as (block_n/128, 128) —
    a (block_n, 1) VMEM window would pad to 128 lanes (128x memory)."""
    n_chunks = x_hbm.shape[0] // block_n
    rows = block_n // 128

    def body(xs, istage, sem_in, sem_out):
        def in_dma(slot, chunk):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(chunk * block_n, block_n), :],
                xs.at[slot], sem_in.at[slot],
            )

        def out_dma(slot, chunk):
            return pltpu.make_async_copy(
                istage.at[slot],
                idx_hbm.at[pl.ds(chunk * rows, rows), :],
                sem_out.at[slot],
            )

        in_dma(0, 0).start()

        def loop_body(chunk, _):
            slot = chunk % 2
            nxt = (chunk + 1) % 2

            @pl.when(chunk + 1 < n_chunks)
            def _():
                in_dma(nxt, chunk + 1).start()

            @pl.when(chunk >= 2)
            def _():
                out_dma(slot, chunk - 2).wait()

            in_dma(slot, chunk).wait()

            scores = jax.lax.dot_general(
                xs[slot], c_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[:]
            idx = _select_epilogue(scores, c_padded)
            istage[slot] = idx.reshape(rows, 128)
            out_dma(slot, chunk).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, loop_body, 0)

        @pl.when(n_chunks >= 2)
        def _():
            out_dma(n_chunks % 2, n_chunks - 2).wait()
        out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((2, block_n, x_hbm.shape[1]), x_hbm.dtype),
        istage=pltpu.VMEM((2, rows, 128), jnp.int32),
        sem_in=pltpu.SemaphoreType.DMA((2,)),
        sem_out=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=('block_n', 'interpret'))
def _nearest_code_pallas(x, embed, bias, *, block_n: int, interpret: bool):
    n, d = x.shape
    c = embed.shape[0]

    if interpret or n < 2 * block_n:
        # grid variant (works in interpreter mode; small-n path).
        # n is padded by the caller to a multiple of 128 (or equals a
        # single sub-128 tile for tiny inputs).
        if n < 128:
            bn = n
        else:
            bn = min(block_n, n)
            while n % bn != 0:          # n is a multiple of 128 here
                bn -= 128
        rows, lane = (max(bn // 128, 1), 128) if bn % 128 == 0 else (1, bn)
        idx = pl.pallas_call(
            functools.partial(_grid_select_kernel, c_padded=c),
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (rows, lane), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n // bn * rows, lane), jnp.int32),
            interpret=interpret,
        )(x, embed, bias)
        return idx.reshape(n)

    idx = pl.pallas_call(
        functools.partial(
            _pipelined_select_kernel, block_n=block_n, c_padded=c
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * d,
            bytes_accessed=n * d * x.dtype.itemsize + c * d * 4 + n * 4,
            transcendentals=0,
        ),
    )(x, embed, bias)
    return idx.reshape(n)


def _prepare_operands(x, embed, metric, block_n):
    """Pad operands so every dim tiles cleanly; padded codes get a -inf bias
    so they never win; padded tokens are sliced away by the caller."""
    n, d = x.shape
    c = embed.shape[0]

    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)

    if metric == 'cosine':
        bias = jnp.zeros((c,), jnp.float32)
    else:
        bias = -0.5 * (embed ** 2).sum(axis=-1)

    d_pad = _round_up(d, 128) - d
    if n >= 2 * block_n:
        n_pad = _round_up(n, block_n) - n      # pipelined path
    elif n >= 128:
        n_pad = _round_up(n, 128) - n          # grid path, lane-packed tiles
    else:
        n_pad = _round_up(n, 8) - n            # tiny single tile
    c_pad = _round_up(c, 128) - c

    if d_pad:
        x = jnp.pad(x, ((0, 0), (0, d_pad)))
        embed = jnp.pad(embed, ((0, 0), (0, d_pad)))
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    if c_pad:
        embed = jnp.pad(embed, ((0, c_pad), (0, 0)))
        bias = jnp.pad(bias, (0, c_pad), constant_values=-3.0e38)

    return x, embed, bias.reshape(1, -1), n


def nearest_code(
    x: jax.Array,
    embed: jax.Array,
    metric: str = 'euclidean',
    *,
    backend: str = 'auto',
    block_n: int = 2048,
    force_xla: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Nearest-code indices for (..., n, d) tokens against (..., c, d) codes.

    Leading (head) dims are vmapped. `backend`: 'auto' picks the fastest
    measured implementation (the fused XLA formulation); 'pallas' forces the
    double-buffered kernel; 'xla' forces the XLA path. Tie-breaking (first
    index) matches jnp.argmin on every path.
    """
    assert metric in ('euclidean', 'cosine')
    if force_xla:
        backend = 'xla'

    if x.ndim > 2:
        fn = functools.partial(
            nearest_code, metric=metric, backend=backend, block_n=block_n,
            interpret=interpret,
        )
        if x.shape[0] == 1 and embed.shape[0] == 1:
            # single-headed: RESHAPE, don't vmap — a size-1 batched
            # matmul+argmax lowers ~2x slower than the 2D form on v5e
            # (benchmarks/rvq_overhead_tpu.py bisect, round 4: 0.61 vs
            # 0.30 ms at 65k x 256, c=1024)
            return fn(x[0], embed[0])[None]
        return jax.vmap(fn)(x, embed)

    on_tpu = jax.default_backend() == 'tpu'
    use_interpret = bool(interpret) if interpret is not None else False

    if use_interpret:
        backend = 'pallas'                 # tests exercise the kernel path
    elif backend == 'auto':
        # measured policy (v5e, round 2): the pipelined Pallas kernel with
        # block_n=4096 beats XLA's fused matmul+argmax by 8-60% for
        # VMEM-resident codebooks at c>=512, d<=256 (0.78 vs 1.25 ms at
        # c=512 d=128; 1.62 vs 1.88 ms at the headline c=512 d=256 —
        # pushing the exact pipeline to ~0.95 of the 4-pass roofline).
        # Outside that measured envelope (small c pathological, d>=512
        # VMEM-tight, big c) XLA stays.
        n_, d_ = x.shape
        c_pad = _round_up(embed.shape[0], 128)
        d_pad = _round_up(d_, 128)
        # scores VMEM scales as block_n * c: cap block_n * c_pad * 4 <= 8MB
        # (c=2048 with bn=2048 fails Mosaic compile at 16MB of scores)
        # n >= 2^18: at composite-scale token counts (65k) the XLA
        # formulation fuses into the surrounding graph and wins instead
        # (GroupedResidualVQ measured 4.45 -> 6.54 ms when Pallas was
        # allowed at n=65k; at n=1M Pallas wins 8-60%)
        if (
            on_tpu
            and 512 <= c_pad <= 1024
            and d_pad <= 256
            and n_ >= (1 << 18)
        ):
            bn = 4096 if c_pad * 4096 * 4 <= 8 * 1024 * 1024 else 2048
            backend = 'pallas'
            block_n = bn
        elif (
            # composite-scale re-gate (round 4): at n=65k, c=1024, d=128
            # Pallas bn=1024 beats XLA standalone (0.185 vs 0.254 ms) AND
            # inside the full composite (GroupedResidualVQ 4.28 -> 3.68 ms,
            # 65% -> 76% of floor — tools/tpu_r4_logs/grouped_regate.log).
            # d=256 stays XLA (ResidualVQ q=8 measured 73% forced vs 79%
            # auto); c=512 at this n is below tunnel timing resolution and
            # stays XLA. The r2 "n-gate" regression was the BLOCK SIZE
            # (bn=4096 at composite scale), not the kernel.
            on_tpu
            and c_pad == 1024
            and d_pad <= 128
            and n_ >= (1 << 16)
        ):
            backend = 'pallas'
            block_n = 1024
        else:
            backend = 'xla'
    if backend == 'xla' or (not on_tpu and not use_interpret):
        return nearest_code_xla(x, embed, metric)

    n, d = x.shape
    c = embed.shape[0]
    # codebook must fit comfortably in VMEM for the resident kernels; larger
    # codebooks stream tile-by-tile through the tiled kernel
    if _round_up(c, 128) * _round_up(d, 128) * 4 > 4 * 1024 * 1024:
        return _nearest_code_tiled(
            x, embed, metric, interpret=use_interpret
        )

    xp, ep, bias, orig_n = _prepare_operands(x, embed, metric, block_n)
    idx = _nearest_code_pallas(
        xp, ep, bias, block_n=block_n, interpret=use_interpret
    )
    return idx[:orig_n]


def _auto_tile(n: int, d: int) -> tuple[int, int]:
    """Blocking for the tiled-codebook kernel.

    Round-4 sweep verdict (benchmarks/largec_tiled_tpu.py on v5e,
    c=8192-65536, n=256k — tools/tpu_r4_logs/largec_tiled.log): the
    inverted-aspect hypothesis (grow block_n, shrink c_tile to cut
    codebook re-streams) is WRONG on silicon — every narrower c_tile is
    strictly slower (2048x512 36%, 4096x256 23% of the MXU floor vs
    2048x1024 at 48-49%); the binding constraint is per-tile epilogue/
    carry work, which scales with the number of c-tiles, not tile DMA.
    8192x256 fails Mosaic compile. Best measured blocking: (2048, 1024).
    XLA's fused matmul+argmax reaches 84-87% at these shapes, so the auto
    path NEVER routes here (the dead-end is certified in BASELINE.md);
    this kernel remains only the exact fallback for `backend='pallas'`
    with a beyond-VMEM codebook.

    Budgets (16MB VMEM): x block block_n*d*4 <= 2MB (double-buffered);
    scores block_n*c_tile*4 <= 8MB.
    """
    d_pad = _round_up(d, 128)
    block_n = min(2048, max(1024, (2 * 1024 * 1024 // (d_pad * 4)) // 1024 * 1024))
    c_tile = min(1024, max(128, (8 * 1024 * 1024 // (block_n * 4)) // 128 * 128))
    return block_n, c_tile


def _nearest_code_tiled(
    x: jax.Array,
    embed: jax.Array,
    metric: str,
    *,
    block_n: int | None = None,
    c_tile: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pad + dispatch to the tiled-codebook selection kernel (codebook
    larger than the VMEM-resident budget; tiles stream double-buffered)."""
    n, d = x.shape
    auto_bn, auto_ct = _auto_tile(n, d)
    block_n = auto_bn if block_n is None else block_n
    c_tile = auto_ct if c_tile is None else c_tile
    x = x.astype(jnp.float32)
    embed = embed.astype(jnp.float32)

    if metric == 'cosine':
        bias = jnp.zeros((embed.shape[0],), jnp.float32)
    else:
        bias = -0.5 * (embed ** 2).sum(axis=-1)

    d_pad = _round_up(d, 128) - d
    n_pad = _round_up(n, block_n) - n
    c_pad = _round_up(embed.shape[0], c_tile) - embed.shape[0]
    if d_pad:
        x = jnp.pad(x, ((0, 0), (0, d_pad)))
        embed = jnp.pad(embed, ((0, 0), (0, d_pad)))
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    if c_pad:
        embed = jnp.pad(embed, ((0, c_pad), (0, 0)))
        bias = jnp.pad(bias, (0, c_pad), constant_values=-3.0e38)

    idx = _nearest_code_pallas_tiled(
        x, embed, bias.reshape(1, -1),
        block_n=block_n, c_tile=c_tile, interpret=interpret,
    )
    return idx[:n]


def quantize_lookup(
    x: jax.Array,
    embed: jax.Array,
    metric: str = 'euclidean',
    *,
    backend: str = 'auto',
    tier: str = 'exact',
) -> tuple[jax.Array, jax.Array]:
    """The full hot pipeline: (..., n, d) tokens -> (indices, quantized).

    tier='exact' (default): f32 selection via `nearest_code` + bit-exact
    lookup via `gather_codes`. This is what bench.py measures against the
    roofline.

    tier='bf16': the serving/bf16-training tier — x and codebook are cast to
    bfloat16; selection scores and the one-hot lookup accumulate in f32 from
    bf16 operands, so indices AND rows are EXACT with respect to the bf16
    values (bf16 is closed under rounding: a bf16-cast input loses nothing
    further). 2 MXU passes instead of 4 -> measured 2.27 ms vs 6.28 ms for
    1M x 256 at c=512 on v5e (2.8x, 462 Mvec/s,
    benchmarks/pipeline_variants_tpu.py); returns bf16 quantized rows.
    Parity evidence: tests/test_core.py::test_bf16_tier_exact_on_bf16_inputs.
    """
    if tier == 'bf16':
        return _quantize_lookup_bf16(x, embed, metric)
    assert tier == 'exact', tier
    idx = nearest_code(x, embed, metric, backend=backend)
    if embed.ndim > 2:
        if embed.shape[0] == 1:
            # single-headed: reshape, don't vmap (size-1 batched gather/
            # matmul lowers slower — see nearest_code)
            quantized = gather_codes(embed[0], idx[0])[None]
        else:
            quantized = jax.vmap(gather_codes)(embed, idx)
    else:
        quantized = gather_codes(embed, idx)
    return idx, quantized


def _quantize_lookup_bf16(
    x: jax.Array, embed: jax.Array, metric: str = 'euclidean'
) -> tuple[jax.Array, jax.Array]:
    if x.ndim > 2:
        if x.shape[0] == 1 and embed.shape[0] == 1:
            i, q = _quantize_lookup_bf16(x[0], embed[0], metric)
            return i[None], q[None]
        return jax.vmap(
            functools.partial(_quantize_lookup_bf16, metric=metric)
        )(x, embed)
    xb = x.astype(jnp.bfloat16)
    eb = embed.astype(jnp.bfloat16)
    scores = jnp.einsum(
        'nd,cd->nc', xb, eb, preferred_element_type=jnp.float32
    )
    if metric == 'euclidean':
        scores = scores - 0.5 * (eb.astype(jnp.float32) ** 2).sum(-1)
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    quantized = gather_codes(eb, idx)
    return idx, quantized
