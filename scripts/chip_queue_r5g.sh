#!/bin/bash
# Round-5 queue g: retry the effective-B=256 accumulation arm with minimal
# resident inputs. The r5f arm OOMed with 5 resident 693 MB uint8 batches
# (settle + 4 timed) ON TOP of the program peak — that residency is bench
# harness, not program: a real fit() loop keeps <=2 batches resident
# (double buffering). --iters 2 retries with 3 resident batches; if it
# still OOMs, the wall is the program itself and accum tops out at k=4.
# Usage: WAIT_PID=<r5f pid> nohup bash scripts/chip_queue_r5g.sh > /tmp/queue_r5g.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5g_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5g queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run train_b256_accum8_lean_r5 3000 python bench_train.py --skip-fit \
    --batch 256 --set grad_accum_steps=8 --iters 2

echo "=== r5g queue done $(date +%H:%M:%S) ===" >&2
