#!/bin/bash
# Round-5 queue f: does the accumulation ladder keep climbing?
#   1. accum=8 / effective B=256 (2x the 8-chip global batch of the
#      reference's recipe on ONE chip) — the B=128 step was +2.6% over
#      B=64; this arm decides whether the axis saturates.
#   2. retry of the b40 fp32 composed arm whose remote compile timed out
#      in queue r5 (the int8 twin compiled in 160 s — suspected relay
#      compile-service variance, worth one retry before booking a verdict).
# Usage: DEADLINE=<epoch_s> \
#          nohup bash scripts/chip_queue_r5f.sh > /tmp/queue_r5f.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5f_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5f queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run train_b256_accum8_r5 3000 python bench_train.py --skip-fit \
    --batch 256 --set grad_accum_steps=8
run train_b40_composed_retry_r5 2400 python bench_train.py --skip-fit \
    --batch 40 --donate-batch --set adam_mu_dtype=bfloat16,remat_policy=full

echo "=== r5f queue done $(date +%H:%M:%S) ===" >&2
