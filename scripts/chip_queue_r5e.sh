#!/bin/bash
# Round-5 queue e: convergence proof for the new single-chip HBM levers.
# Throughput arms (queues r5b/r5c) say what int8 moments COST; these say
# whether they still TRAIN — same synthetic-oracle protocol as every
# VALIDATION accuracy entry (train_eval_synth.py, 700 steps, 4 classes,
# 112px; fp32 reference point: 0.9242/0.9409 frame-mAP@0.5/@0.2).
#   1. adam_moments=int8 alone.
#   2. adam_moments=int8 + grad_accum_steps=2 (the composed shipped-lever
#      stack; accum alone needs no convergence run — exact-parity tests
#      prove k micro-batches == one k-batch step).
# Usage: WAIT_PID=<r5d pid> DEADLINE=<epoch_s> \
#          nohup bash scripts/chip_queue_r5e.sh > /tmp/queue_r5e.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5e_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5e queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run conv_int8_r5 3600 python scripts/train_eval_synth.py \
    --tag int8_moments --steps 700 --set adam_moments=int8
run conv_int8_accum_r5 3600 python scripts/train_eval_synth.py \
    --tag int8_accum2 --steps 700 --set adam_moments=int8,grad_accum_steps=2

echo "=== r5e queue done $(date +%H:%M:%S) ===" >&2
