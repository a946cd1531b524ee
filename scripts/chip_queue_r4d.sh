#!/bin/bash
# Round-4 chip queue v4: the two [P1] re-baselines that didn't fit the
# earlier windows (TODO item 2), preceded by the fresh train trace at the
# shipped B=32+dots config (the VERDICT round-5 opener, pulled forward).
#   1. profile_train --batch 32: rank where the 362 ms step now goes after
#      remat+dots; decides whether train has another cheap win this round.
#   2. ml60@112 at the FULL 1500 steps under the official matcher — the
#      r4b slot only fit 700 steps (0.5764, not comparable to r3's
#      1500-step 0.863 [P0]).
#   3. ava60@224 1500-step re-train [P1] (~2.5 h) — the flagship number.
# Usage: WAIT_PID=<pid> DEADLINE=<epoch_s> nohup bash scripts/chip_queue_r4d.sh &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r4_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

echo "=== queue v4 start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

# 0. Drain the in-flight bench.py latency A/B (its own process owns the
#    chip; the relay serializes clients and the profiler HANGS if another
#    TPU process is live).
drain_pid "$WAIT_PID"

# 1. Fresh train trace at the shipped config (exclusive chip use).
run train_trace_b32 2400 python scripts/profile_train.py --batch 32 --top 40

# 2. ml60@112 full-length [P1] re-run (700 steps took ~406 s train + eval).
run ml60_1500_r4 3600 python scripts/train_eval_synth.py \
  --tag ml60_1500_r4 --classes 60 --set multilabel=True,num_classes=60 \
  --steps 1500 --save-variables .sweeps/ml60_1500_vars.msgpack

# 3. ava60@224 1500-step re-train [P1] (the long one — last so earlier
#    results survive a deadline).
run ava60_224_r4 12000 python scripts/train_eval_synth.py \
  --tag ava60_224_r4 --classes 60 --image-size 224 \
  --set multilabel=True,num_classes=60 --steps 1500 \
  --save-variables .sweeps/ava60_vars_r4.msgpack

echo "=== queue v4 done $(date +%H:%M:%S), $(left)s to deadline ===" >&2
