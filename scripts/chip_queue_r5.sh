#!/bin/bash
# Round-5 chip queue (VERDICT r4 next #3/#4/#5): serialized single-chip
# runs. The relay serializes the chip — NOTHING else may use the TPU
# while this runs.
#   1. bench.py headline reconfirm (round-5 code, shipped options).
#   2. bench_train baseline B=32 reconfirm.
#   3. Gradient-accumulation arms: effective B=64 (2x32) and B=128 (4x32)
#      — the reference's multi-GPU effective batches, single chip
#      (VERDICT #3 "bench_train arm recorded").
#   4. B=48/40 OOM attack, composed savings: mu-bf16 + remat_policy=full
#      + donated batch (VERDICT #5 ladder; B=48 OOM'd at r4 with mu-bf16
#      alone).
#   5. Serving compiler-flag sweep beyond scoped VMEM (VERDICT #4),
#      composed against the shipped 90112 KiB baseline.
# Usage: DEADLINE=<epoch_s> nohup bash scripts/chip_queue_r5.sh \
#          > /tmp/queue_r5.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run

echo "=== r5 queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

# 1. headline (also sanity: round-5 edits left serving untouched)
run bench_r5 2400 python bench.py

# 2-4. train arms (--skip-fit: the step benchmark is the decision surface)
run train_b32_base_r5 1800 python bench_train.py --skip-fit --batch 32
run train_b64_accum2_r5 2000 python bench_train.py --skip-fit --batch 64 \
    --set grad_accum_steps=2
run train_b128_accum4_r5 2400 python bench_train.py --skip-fit --batch 128 \
    --set grad_accum_steps=4
# OOM attack ladder: composed HBM savings at real (non-accum) batches
run train_b48_composed_r5 2000 python bench_train.py --skip-fit --batch 48 \
    --donate-batch --set adam_mu_dtype=bfloat16,remat_policy=full
run train_b40_composed_r5 2000 python bench_train.py --skip-fit --batch 40 \
    --donate-batch --set adam_mu_dtype=bfloat16,remat_policy=full
# accum with bf16-mu: the deepest effective batch that could ship
run train_b64_accum2_mubf16_r5 2000 python bench_train.py --skip-fit \
    --batch 64 --set grad_accum_steps=2,adam_mu_dtype=bfloat16

# 5. the serving flag sweep (writes its own per-arm jsonl too)
run flags_sweep_r5 7200 python scripts/bench_flags_r5.py \
    --out .sweeps/flags_r5.jsonl

echo "=== r5 queue done $(date +%H:%M:%S) ===" >&2
