#!/bin/bash
# Round-5 queue d: the compiler-flag A/B on the OTHER two shipped programs
# (VERDICT r4 next #4 names all three: serving B=128 — covered by queue
# r5/r5c — latency B=1, train B=32).
#   1. B=1 latency program: the FULL 20-candidate list (B=1 compiles are
#      cheap; baseline = shipped scoped VMEM, decision metric chained ms).
#   2. B=32 train step: an 8-flag shortlist — train compiles cost
#      180-540 s each through the relay's remote-compile service, so the
#      full list would burn ~3 h; the shortlist keeps the scheduling /
#      fusion-memory / remat families most plausible for a fwd+bwd
#      program and drops the dot-fusion micro-knobs that were flat on the
#      serving program. Baseline = compiler defaults (scoped VMEM measured
#      noise-or-worse on train, VALIDATION r4 queue-v3).
# Usage: WAIT_PID=<r5c pid> DEADLINE=<epoch_s> \
#          nohup bash scripts/chip_queue_r5d.sh > /tmp/queue_r5d.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5d_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5d queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run flags_latency_r5 4800 python scripts/bench_flags_r5.py \
    --program latency --out .sweeps/flags_latency_r5.jsonl --resume

run flags_train_r5 9000 python scripts/bench_flags_r5.py \
    --program train --out .sweeps/flags_train_r5.jsonl --resume \
    --candidates xla_tpu_enable_latency_hiding_scheduler,xla_tpu_rwb_fusion,xla_tpu_scavenge_vmem_for_fusions,xla_tpu_enable_multi_level_nested_loop_fusion,xla_tpu_memory_bound_loop_optimizer_options,xla_jf_rematerialization_percent_shared_memory_limit,xla_tpu_vector_load_fusion_window,xla_tpu_async_copy_bandwidth_scaling_factor

echo "=== r5d queue done $(date +%H:%M:%S) ===" >&2
