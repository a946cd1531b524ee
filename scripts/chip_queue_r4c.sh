#!/bin/bash
# Round-4 chip queue v3: follow-ups surfaced by the v2 results.
#   - scoped-VMEM A/B on the TRAIN step (the serving sweep's 65536 KiB arm
#     won +13.3% on the optimized detect program; train MFU sits at 0.1974,
#     2% under the VERDICT >=0.20 target — this is the cheapest candidate).
#   - linking bucket-order diagnostic: v2 measured link L=64 3.7x SLOWER
#     than L=128 with L=64 always first after the detect phase; re-running
#     both lengths twice in interleaved order separates relay settle from
#     the program cost.
#   - B=48 + adam_mu_dtype=bfloat16 train arm: B=64 OOMed, mu-bf16 frees
#     ~50 MB — probe whether a bigger batch fits and wins.
# Usage: WAIT_PID=<pid> DEADLINE=<epoch_s> nohup bash scripts/chip_queue_r4c.sh &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r4_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 7200 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / sweep_arm / drain_pid

echo "=== queue v3 start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

# 0. Wait for the in-flight bench.py verify run (the relay serializes).
drain_pid "$WAIT_PID"

# 1. Train-step scoped-VMEM A/B (default arm baseline: 88.65 clips/s,
#    BENCH_TRAIN_r04.json).
sweep_arm b32_dots_vmem64 --vmem-limit-kib 65536
sweep_arm b32_dots_vmem32 --vmem-limit-kib 32768

# 2. Linking bucket-order diagnostic (interleaved, repeats).
run stream_order_r4 1500 python scripts/bench_linking_stream.py \
  --clips 64 --buckets 64 128 64 128

# 3. Larger-batch probe now that mu-bf16 frees optimizer HBM.
sweep_arm b48_dots_mubf16 --batch 48 --set adam_mu_dtype=bfloat16

echo "=== queue v3 done $(date +%H:%M:%S), $(left)s to deadline ===" >&2
