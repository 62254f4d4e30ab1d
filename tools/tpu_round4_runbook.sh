#!/bin/bash
# Round-4 follow-up on-chip batch (after tools/tpu_round3_runbook.sh):
#  - real tracebacks for the fused train kernel's silicon failure
#  - GroupedRVQ composite with the selection gate overridden (re-gate decision)
#  - sharded decode re-run after the sharded_gather_codes crossover fix
#  - fixed large-c tiled sweep (the r3 run died on a harness unpack bug)
#  - sharded bf16 tier re-run after the local-one-hot simplification
#
# Same rules as the r3 runbook: host must be idle; PYTHONPATH keeps the
# axon entry.

set -x
cd /root/repo
mkdir -p tools/tpu_r4_logs

run() {  # run <name> <timeout-s> <cmd...>
    name=$1; t=$2; shift 2
    echo "=== $name ==="
    timeout "$t" env PYTHONPATH=/root/.axon_site:/root/repo "$@" \
        2>&1 | tee "tools/tpu_r4_logs/$name.log"
}

# 1. fused train kernel: REAL tracebacks at bn=512 (ValueError) and
#    bn=1024 (JaxRuntimeError) — r3 only ever ran this in interpret mode
run train_fused_trace 900 python - << 'EOF'
import os
os.environ['JAX_TRACEBACK_FILTERING'] = 'off'
import sys; sys.path.insert(0, '/root/repo')
import traceback
import jax, jax.numpy as jnp
from vqtpu.kernels.train_fused import fused_train_quantize

x = jax.random.normal(jax.random.PRNGKey(0), (1 << 18, 256), jnp.float32)
e = jax.random.normal(jax.random.PRNGKey(1), (512, 256), jnp.float32)
for bn in (512, 1024):
    print(f'##### block_n={bn}')
    try:
        out = jax.jit(lambda x, e: fused_train_quantize(x, e, block_n=bn),
                      static_argnums=())(x, e)
        jax.block_until_ready(out)
        print('OK', [o.shape for o in out])
    except Exception:
        traceback.print_exc()
EOF

# 2. GroupedRVQ re-gate decision
run grouped_regate 1800 python benchmarks/grouped_regate_tpu.py

# 3. sharded decode after the crossover fix (the r3 formulation crashed
#    the worker at c=65536; keep this before anything long in case it
#    still does)
run decode_sharded_fixed 1800 python benchmarks/decode_tpu.py --sharded

# 4. large-c tiled sweep, fixed harness
run largec_tiled 2400 python benchmarks/largec_tiled_tpu.py

# 5. sharded bf16 tier after the one-hot simplification
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

# 6. LFQ 2^18 training forward, proper harness (the r3 inline loop
#    produced a negative slope — time the jitted module fwd via
#    timeit_chained on the INPUT with a full-output reduction)
run lfq_2e18_timing 1200 python - << 'EOF'
import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
from flax import nnx
import vqtpu
from vqtpu.utils import timeit_chained

lfq = vqtpu.LFQ(codebook_size=2**18, dim=18, entropy_loss_weight=0.1,
                rngs=nnx.Rngs(0))
graphdef, state = nnx.split(lfq)
x = jax.random.normal(jax.random.PRNGKey(0), (8, 1024, 18))

def fwd(z, x, state):
    m = nnx.merge(graphdef, state)
    xhat, ind, aux = m(x + z * 1e-20)
    return xhat.sum() * 1e-6 + ind.sum().astype(jnp.float32) * 1e-12 + aux

t = timeit_chained(fwd, jnp.float32(0), x, state, lo=4, hi=52)
print(f'LFQ 2^18 train fwd: {t*1e3:.3f} ms ({8*1024/t/1e6:.2f} Mtok/s)')
EOF

echo "R4 BATCH DONE — logs in tools/tpu_r4_logs/"
