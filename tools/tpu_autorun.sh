#!/bin/bash
# Auto-fire the on-chip runbook the moment the TPU tunnel returns.
#
# Coordination protocol (single-core host; load skews tunnel timings 50%+):
#   - the tunnel poller (separate loop) touches /tmp/TPU_IS_UP when
#     `jax.devices()` succeeds again;
#   - any CPU-heavy job (pytest, parity harness) holds /tmp/CPU_BUSY while
#     it runs; this script waits for the lock to clear before benching so
#     measured slopes are clean;
#   - once both conditions hold, runs tools/tpu_round3_runbook.sh and
#     touches /tmp/RUNBOOK_DONE.

set -u
while true; do
    if [ -e /tmp/TPU_IS_UP ]; then
        if [ -e /tmp/CPU_BUSY ]; then
            echo "tpu up but host busy ($(date))" >> /tmp/tpu_autorun.log
            sleep 60
            continue
        fi
        echo "tpu up + host idle; firing runbook ($(date))" >> /tmp/tpu_autorun.log
        bash /root/repo/tools/tpu_round3_runbook.sh \
            > /tmp/runbook_out.log 2>&1
        touch /tmp/RUNBOOK_DONE
        echo "runbook done ($(date))" >> /tmp/tpu_autorun.log
        exit 0
    fi
    sleep 60
done
