#!/bin/bash
# Round-4 continuation: per-family parity seed extension (single-core host).
# Serial queue; holds /tmp/CPU_BUSY while a chunk runs so TPU measurement
# windows can check for an idle host. Touch /tmp/QUEUE_STOP to stop between
# chunks (e.g. before an on-chip measurement or near round end); re-running
# the script resumes — chunks whose output JSON already exists are skipped.

set -u
cd /root/repo
mkdir -p benchmarks/logs

chunk() {  # chunk <name> <out_json> <cmd...>
    name=$1; out=$2; shift 2
    if [ -e "$out" ]; then
        echo "skip  $name (output exists)" >> /tmp/cpu_queue.log
        return
    fi
    if [ -e /tmp/QUEUE_STOP ]; then
        echo "stop requested — yielding before $name ($(date))" >> /tmp/cpu_queue.log
        rm -f /tmp/CPU_BUSY
        exit 0
    fi
    touch /tmp/CPU_BUSY
    echo "start $name ($(date))" >> /tmp/cpu_queue.log
    timeout 2400 "$@" > "benchmarks/logs/$name.log" 2>&1
    echo "done  $name rc=$? ($(date))" >> /tmp/cpu_queue.log
    rm -f /tmp/CPU_BUSY
}

fsq_run() {  # fsq_run <seed> <out>
    python -c "
import sys; sys.path.insert(0, '/root/repo/benchmarks')
from parity_fsq import main; main(seed=$1)
" && mv benchmarks/parity_fsq.json "$2" \
  && git -C /root/repo checkout -- benchmarks/parity_fsq.json
}
export -f fsq_run 2>/dev/null || true

# seed-7 sweep across every single-seed family first (breadth beats depth)
chunk lfq_seed7   benchmarks/parity_lfq_seed7.json   python benchmarks/parity_lfq.py   --seed 7  --out benchmarks/parity_lfq_seed7.json
chunk hq_seed7    benchmarks/parity_hq_seed7.json    python benchmarks/parity_hq.py    --seed 7  --out benchmarks/parity_hq_seed7.json
chunk simvq_seed7 benchmarks/parity_simvq_seed7.json python benchmarks/parity_simvq.py --seed 7  --out benchmarks/parity_simvq_seed7.json
chunk fsq_seed7   benchmarks/parity_fsq_seed7.json   bash -c 'fsq_run 7 benchmarks/parity_fsq_seed7.json'
chunk fsp_seed7   benchmarks/parity_fsp_seed7.json   python benchmarks/parity_fsp.py   --seed 7  --out benchmarks/parity_fsp_seed7.json

# then seed-99, same order, while wall-clock remains
chunk lfq_seed99   benchmarks/parity_lfq_seed99.json   python benchmarks/parity_lfq.py   --seed 99 --out benchmarks/parity_lfq_seed99.json
chunk hq_seed99    benchmarks/parity_hq_seed99.json    python benchmarks/parity_hq.py    --seed 99 --out benchmarks/parity_hq_seed99.json
chunk simvq_seed99 benchmarks/parity_simvq_seed99.json python benchmarks/parity_simvq.py --seed 99 --out benchmarks/parity_simvq_seed99.json
chunk fsq_seed99   benchmarks/parity_fsq_seed99.json   bash -c 'fsq_run 99 benchmarks/parity_fsq_seed99.json'

echo "queue complete ($(date))" >> /tmp/cpu_queue.log
