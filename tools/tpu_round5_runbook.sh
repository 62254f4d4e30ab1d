#!/bin/bash
# Round-5 idle-host TPU measurement batch (VERDICT r4 items 2, 3, 9, 10).
# Run ONLY on an idle host — host load skews tunnel slopes 50%+ (CLAUDE.md).

set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
mkdir -p tools/tpu_r5_logs

run() {  # run <name> <cmd...>
    name=$1; shift
    echo "=== $name ($(date)) ==="
    timeout 2400 "$@" 2>&1 | tee "tools/tpu_r5_logs/$name.log" | tail -20
}

# 1. full-zoo floor table (VERDICT #2) — run twice (re-run rule)
run composites_zoo_a python benchmarks/composites_tpu.py
run composites_zoo_b python benchmarks/composites_tpu.py

# 2. stacked-layer lax.scan vs unrolled ResidualVQ (VERDICT #3)
run rvq_scan python benchmarks/rvq_scan_tpu.py

# 3. GroupedRVQ median-of-5 (VERDICT #9)
run grouped_median python benchmarks/grouped_median_tpu.py

# 4. driver metric confirmation (VERDICT #10)
run bench_r5 python bench.py

# ---- third r5 session (zoo completion + fused ResidualFSQ verdict) ----

# 5. elementwise zoo subset, perturb-hardened (VERDICT #2 completion)
run composites_zoo_ew_e python benchmarks/composites_tpu.py ew

# 6. HierarchicalVQ probes: NHWC layout A/B + kmeans-cond eval tax
run hq_nhwc_probe python benchmarks/hq_nhwc_probe.py
run hq_kmeans_ab python benchmarks/hq_kmeans_ab.py

# 7. ResidualFSQ root-cause batch: layout A/Bs + stream calibration
run fsq_pack_probe python benchmarks/fsq_pack_probe.py

# 8. fused ResidualFSQ kernel A/B + exactness gate (eval_fused)
run rfsq_fused_ab python benchmarks/rfsq_fused_tpu.py

# 9. final driver-metric capture
run bench_r5_final python bench.py
