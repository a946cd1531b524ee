#!/bin/bash
# Round-5 resume queue: the session restart killed chip_queue_r5.sh mid
# flag-sweep (7/20 composed arms recorded) and chip_queue_r5b.sh (the int8
# adam-moment arms) never started. This queue finishes both. Serialized —
# nothing else may use the TPU while it runs.
#   1. Resume the serving compiler-flag sweep (bench_flags_r5.py --resume
#      skips recorded arms; a fresh baseline arm brackets the boundary).
#   2. The four r5b int8-moment train arms (see chip_queue_r5b.sh header).
# Usage: DEADLINE=<epoch_s> nohup bash scripts/chip_queue_r5c.sh \
#          > /tmp/queue_r5c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5c_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5c queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run flags_sweep_r5_resume 5400 python scripts/bench_flags_r5.py \
    --out .sweeps/flags_r5.jsonl --resume

run train_b32_int8_r5 2000 python bench_train.py --skip-fit --batch 32 \
    --set adam_moments=int8
run train_b48_int8_composed_r5 2000 python bench_train.py --skip-fit \
    --batch 48 --donate-batch --set adam_moments=int8,remat_policy=full
run train_b40_int8_composed_r5 2000 python bench_train.py --skip-fit \
    --batch 40 --donate-batch --set adam_moments=int8,remat_policy=full
run train_b128_accum4_int8_r5 2400 python bench_train.py --skip-fit \
    --batch 128 --set grad_accum_steps=4,adam_moments=int8

echo "=== r5c queue done $(date +%H:%M:%S) ===" >&2
