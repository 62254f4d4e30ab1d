#!/bin/bash
# Round-3 on-chip measurement runbook — run when the TPU tunnel is back.
# Each step appends to tools/tpu_r3_logs/; steps are ordered so the most
# driver-critical numbers land first if the tunnel drops again.
#
#   PYTHONPATH must keep the axon entry (CLAUDE.md): every python below runs
#   as PYTHONPATH=/root/.axon_site:/root/repo python ...
#
# Do NOT run while the CPU test suite (or any all-core job) is running —
# host load skews tunnel-call slopes 50%+ (observed r2).

set -x
cd /root/repo
mkdir -p tools/tpu_r3_logs
P="PYTHONPATH=/root/.axon_site:/root/repo"

run() {  # run <name> <timeout-s> <cmd...>
    name=$1; t=$2; shift 2
    echo "=== $name ==="
    timeout "$t" env PYTHONPATH=/root/.axon_site:/root/repo "$@" \
        2>&1 | tee "tools/tpu_r3_logs/$name.log"
}

# 1. driver metric (median-of-7; VERDICT item 8)
run bench 1200 python bench.py

# 2. verify drive on silicon (kernel exactness gate)
run verify_tpu 1200 python tools/verify_drive.py tpu

# 3. fused train kernel: exactness gate + block_n sweep (VERDICT item 2)
run train_step 2400 python benchmarks/train_step_tpu.py

# 4. composite-envelope breakdown (VERDICT item 3)
run grouped_shape 2400 python benchmarks/grouped_shape_tpu.py

# 5. sharded decode overhead at world=1 (VERDICT item 6)
run decode_sharded 1800 python benchmarks/decode_tpu.py --sharded

# 6. LFQ 2^18 chunked entropy on-chip smoke (VERDICT item 5)
run lfq_2e18 1200 python - << 'EOF'
import jax, jax.numpy as jnp
from flax import nnx
import sys; sys.path.insert(0, '/root/repo')
import vqtpu
lfq = vqtpu.LFQ(codebook_size=2**18, dim=18, entropy_loss_weight=0.1,
                rngs=nnx.Rngs(0))
x = jax.random.normal(jax.random.PRNGKey(0), (8, 1024, 18))
@nnx.jit
def step(m, x):
    xhat, ind, aux = m(x)
    return aux
print('LFQ 2^18 entropy aux:', float(step(lfq, x)))
from vqtpu.utils import timeit_chained
from flax import nnx as _n
graphdef, state = _n.split(lfq)
def fwd(z, x, state):
    state = jax.tree.map(
        lambda a: a + z * 1e-20
        if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
        else a, state)
    m = _n.merge(graphdef, state)
    out = m(x)
    return jax.tree.leaves(out)[:2]
t = timeit_chained(fwd, jnp.float32(0), x, state, lo=2, hi=10)
print(f'LFQ 2^18 train fwd: {t*1e3:.3f} ms ({8*1024/t/1e6:.2f} Mtok/s)')
EOF

# 7. beam determinism cost at the BASELINE beam shape (VERDICT item 4 tail)
run beam_cost 1800 python - << 'EOF'
import jax, jax.numpy as jnp
from flax import nnx
import sys; sys.path.insert(0, '/root/repo')
import vqtpu
from vqtpu.utils import timeit_chained
for prec in (None, jax.lax.Precision.HIGHEST):
    rvq = vqtpu.ResidualVQ(dim=256, num_quantizers=8, codebook_size=1024,
                           beam_size=4, beam_score_precision=prec,
                           rngs=nnx.Rngs(0))
    rvq.eval()
    graphdef, state = nnx.split(rvq)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2048, 256))
    def fwd(z, x, state):
        state = jax.tree.map(
            lambda a: a + z * 1e-20
            if (hasattr(a, 'dtype') and a.dtype == jnp.float32 and a.ndim >= 1)
            else a, state)
        m = nnx.merge(graphdef, state)
        out = m(x)
        return jax.tree.leaves(out)[:2]
    t = timeit_chained(fwd, jnp.float32(0), x, state, lo=2, hi=10)
    print(f'beam_score_precision={prec}: {t*1e3:.3f} ms '
          f'({4*2048/t/1e3:.0f} Ktok/s)')
EOF

# 8. composite zoo throughput regression (BASELINE round-2 table refresh)
run composites 2400 python benchmarks/composites_tpu.py

# 8b. large-c selection: restructured tiled kernel vs XLA (VERDICT r3 item
# 8 — the ONE new blocking attempt; flip the auto policy or certify XLA)
run largec_tiled 2400 python benchmarks/largec_tiled_tpu.py

# 8c. sharded bf16 serving tier (r4 feature): single-chip overhead vs the
# unsharded tier at serving scale (world=1 axis binding, like decode row)
run tp_bf16_tier 1200 python - << 'EOF'
import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from vqtpu.kernels.distance import quantize_lookup
from vqtpu.parallel.shard import sharded_quantize_lookup_bf16
from vqtpu.utils import timeit_chained

n, c, d = 1 << 20, 4096, 256
x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32)
e = jax.random.normal(jax.random.PRNGKey(1), (c, d), jnp.float32)
t = timeit_chained(lambda x, e: quantize_lookup(x, e, tier='bf16'), x, e,
                   lo=2, hi=10)
print(f'unsharded bf16 tier: {t*1e3:.3f} ms ({n/t/1e6:.0f} Mvec/s)')
mesh = Mesh(np.array(jax.devices()).reshape(1), ('code',))
f = jax.jit(jax.shard_map(
    lambda x, e: sharded_quantize_lookup_bf16(x, e, 'code'),
    mesh=mesh, in_specs=(P(), P('code')), out_specs=(P(), P()),
    check_vma=False))
t = timeit_chained(f, x, e, lo=2, hi=10)
print(f'sharded  bf16 tier (world=1): {t*1e3:.3f} ms ({n/t/1e6:.0f} Mvec/s)')
EOF

# 9. all-quantizer TPU smoke (long; last)
run smoke_all 2400 python benchmarks/tpu_smoke_all.py

echo "ALL DONE — logs in tools/tpu_r3_logs/"
