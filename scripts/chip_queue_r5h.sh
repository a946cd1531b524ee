#!/bin/bash
# Round-5 queue h: second retry of the effective-B=256 accumulation arm.
# r5f OOMed with 5 resident 693 MB uint8 input batches (bench-harness
# residency on top of the program peak); r5g's --iters 2 was rejected by
# the CLI guard (min 3). --iters 3 is the leanest legal arm: 4 resident
# batches (~2.8 GB), one fewer than the OOM run. If this still OOMs, the
# wall is the program peak itself and accumulation tops out at k=4
# (effective B=128) on one v5e chip — record that as the ladder's end.
# Usage: nohup bash scripts/chip_queue_r5h.sh > /tmp/queue_r5h.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5h_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5h queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run train_b256_accum8_lean3_r5 3000 python bench_train.py --skip-fit \
    --batch 256 --set grad_accum_steps=8 --iters 3

echo "=== r5h queue done $(date +%H:%M:%S) ===" >&2
