#!/bin/bash
# Round-5 follow-up chip queue: int8-moment arms (the HBM lever built after
# the main r5 queue launched) + the accumulation ladder's shipping
# candidates composed with it. Serialized — nothing else may use the TPU.
#   1. B=32 int8 moments alone: the quant/dequant throughput cost at the
#      baseline batch (decision input: ship or keep opt-in).
#   2-3. B=48/40 REAL batches, int8 + remat_policy=full + donated batch —
#      the composed HBM attack (VERDICT r4 next #5; B=48 OOM'd at r4 with
#      mu-bf16 alone).
#   4. B=128 accum=4 + int8 moments: the deepest effective batch composed
#      with the smallest resident state.
# Usage: DEADLINE=<epoch_s> bash scripts/chip_queue_r5b.sh \
#          > /tmp/queue_r5b.log 2>&1
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5b_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 7200 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5b queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run train_b32_int8_r5 2000 python bench_train.py --skip-fit --batch 32 \
    --set adam_moments=int8
run train_b48_int8_composed_r5 2000 python bench_train.py --skip-fit \
    --batch 48 --donate-batch --set adam_moments=int8,remat_policy=full
run train_b40_int8_composed_r5 2000 python bench_train.py --skip-fit \
    --batch 40 --donate-batch --set adam_moments=int8,remat_policy=full
run train_b128_accum4_int8_r5 2400 python bench_train.py --skip-fit \
    --batch 128 --set grad_accum_steps=4,adam_moments=int8

echo "=== r5b queue done $(date +%H:%M:%S) ===" >&2
