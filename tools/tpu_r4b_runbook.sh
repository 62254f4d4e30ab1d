#!/bin/bash
# Round-4 late batch: idle-host TPU measurements for the session's new
# features. Run ONLY with the CPU queue stopped (touch /tmp/QUEUE_STOP and
# wait for /tmp/CPU_BUSY to clear) — host load skews tunnel slopes 50%+.

set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p tools/tpu_r4_logs

run() {  # run <name> <cmd...>
    name=$1; shift
    echo "=== $name ($(date)) ==="
    timeout 1200 "$@" 2>&1 | tee "tools/tpu_r4_logs/$name.log" | tail -15
}

# 1. fused LFQ entropy: final idle numbers at the BASELINE shape
run lfq_entropy_final python benchmarks/lfq_entropy_tpu.py

# 2. block sweep (block_n x block_k) for the fused sweeps
run lfq_entropy_bk4096 python benchmarks/lfq_entropy_tpu.py --block_k 4096
run lfq_entropy_bn1024 python benchmarks/lfq_entropy_tpu.py --block_n 1024

# 2b. scale smoke: K = 2^20 (the chunked row's upper range)
run lfq_entropy_2e20 python benchmarks/lfq_entropy_tpu.py --dim 20 --n 4096

# 3. group-parallel world-1 overhead at the composite shape
run group_world1 python benchmarks/group_parallel_tpu.py

# 4. driver-metric confirmation (median-of-7 slopes)
run bench_confirm python bench.py
