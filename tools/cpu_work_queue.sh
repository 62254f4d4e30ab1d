#!/bin/bash
# Sequential CPU-heavy work queue (single-core host). Holds /tmp/CPU_BUSY
# while a chunk runs; between chunks, if the TPU tunnel has returned
# (/tmp/TPU_IS_UP) it stops and clears the lock so tools/tpu_autorun.sh
# can fire the on-chip runbook with an idle host.

set -u
cd /root/repo
mkdir -p benchmarks/logs

chunk() {  # chunk <name> <cmd...>
    name=$1; shift
    if [ -e /tmp/TPU_IS_UP ]; then
        echo "tpu is up — yielding before $name ($(date))" >> /tmp/cpu_queue.log
        rm -f /tmp/CPU_BUSY
        exit 0
    fi
    touch /tmp/CPU_BUSY
    echo "start $name ($(date))" >> /tmp/cpu_queue.log
    timeout 2400 "$@" > "benchmarks/logs/$name.log" 2>&1
    echo "done  $name rc=$? ($(date))" >> /tmp/cpu_queue.log
    rm -f /tmp/CPU_BUSY
}

# new families first: one both-framework row for every reference example
chunk simvq_seed1234 python benchmarks/parity_simvq.py --seed 1234
chunk fsp_qr1        python benchmarks/parity_fsp.py --seed 1234 --quantize_rate 1.0 --out /root/repo/benchmarks/parity_fsp_qr1.json
chunk fsp_seed1234   python benchmarks/parity_fsp.py --seed 1234

chunk lfq_seed7  python benchmarks/parity_lfq.py --seed 7  --out benchmarks/parity_lfq_seed7.json
chunk lfq_seed99 python benchmarks/parity_lfq.py --seed 99 --out benchmarks/parity_lfq_seed99.json
chunk hq_seed7   python benchmarks/parity_hq.py  --seed 7  --out benchmarks/parity_hq_seed7.json
chunk hq_seed99  python benchmarks/parity_hq.py  --seed 99 --out benchmarks/parity_hq_seed99.json
# parity_fsq has no CLI; call main(seed=...) and move the fixed out path
chunk fsq_seed7 bash -c 'python -c "
import sys; sys.path.insert(0, \"/root/repo/benchmarks\")
from parity_fsq import main; main(seed=7)
" && mv benchmarks/parity_fsq.json benchmarks/parity_fsq_seed7.json \
   && git checkout -- benchmarks/parity_fsq.json'
chunk fsq_seed99 bash -c 'python -c "
import sys; sys.path.insert(0, \"/root/repo/benchmarks\")
from parity_fsq import main; main(seed=99)
" && mv benchmarks/parity_fsq.json benchmarks/parity_fsq_seed99.json \
   && git checkout -- benchmarks/parity_fsq.json'

chunk simvq_seed7  python benchmarks/parity_simvq.py --seed 7  --out benchmarks/parity_simvq_seed7.json
chunk simvq_seed99 python benchmarks/parity_simvq.py --seed 99 --out benchmarks/parity_simvq_seed99.json

echo "queue complete ($(date))" >> /tmp/cpu_queue.log
