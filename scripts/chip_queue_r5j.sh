#!/bin/bash
# Round-5 queue j: serving batch x scoped-VMEM interaction sweep — the one
# serving axis never measured (r4 swept batch at compiler defaults and
# vmem at B=128 only; B=256@defaults tied B=128@defaults). 16 arms + two
# B=128@90112 controls; if any pair beats the 529 clips/s headline outside
# the +/-2% relay floor, confirm with an interleaved pair before shipping.
# Usage: WAIT_PID=<r5i pid> nohup bash scripts/chip_queue_r5j.sh > /tmp/queue_r5j.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5j_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5j queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run batch_vmem_r5 7200 python scripts/bench_sweep.py --batch-vmem

echo "=== r5j queue done $(date +%H:%M:%S) ===" >&2
