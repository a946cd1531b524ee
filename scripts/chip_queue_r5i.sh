#!/bin/bash
# Round-5 queue i: the per-round committed train benchmark artifacts.
#   1. BENCH_TRAIN_r05.json — shipped defaults (B=32, fp32 moments,
#      grad_accum_steps=1), same protocol as BENCH_TRAIN_r04.json so the
#      round-over-round comparison stays apples-to-apples.
#   2. BENCH_TRAIN_r05_accum128.json — the round-5 winner arm (effective
#      B=128 via grad_accum_steps=4; exact-parity tests prove k
#      micro-batches == one k-batch step, so this is the honest
#      single-chip stand-in for the reference's multi-GPU effective
#      batch). Committed as a SIBLING artifact, clearly labeled — the
#      shipped default stays B=32 because the preset's LR/schedule are
#      tuned for that batch and changing training hyperparameters is not
#      a perf decision.
# Usage: WAIT_PID=<r5h pid> nohup bash scripts/chip_queue_r5i.sh > /tmp/queue_r5i.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5i_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5i queue start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

artifact() {  # artifact <tag> <dest.json> <timeout_s> <cmd...>
  tag="$1"; dest="$2"; to="$3"; shift 3
  rem=$(left)
  if [ "$rem" -lt 120 ]; then
    echo "SKIP $tag: ${rem}s left ($dest untouched)" >&2
    return
  fi
  [ "$to" -gt "$rem" ] && to=$rem
  echo "--- $tag -> $dest: timeout=$to $* ($(date +%H:%M:%S)) ---" >&2
  # rc from the command itself, not a pipe (tail would mask it)
  timeout "$to" "$@" >.sweeps/"$tag".out 2>.sweeps/"$tag".stderr
  rc=$?
  record "$tag" "$rc"
  tail -1 .sweeps/"$tag".out > /tmp/"$tag".json
  if [ $rc -eq 0 ] && python -c "import json,sys; json.load(open('/tmp/$tag.json'))"; then
    cp /tmp/"$tag".json "$dest"
    echo "$tag OK: $(cat "$dest")" >&2
  else
    echo "$tag FAILED rc=$rc ($dest untouched)" >&2
  fi
}

artifact bench_train_r05 BENCH_TRAIN_r05.json 2400 \
  python bench_train.py --skip-fit
artifact bench_train_r05_accum128 BENCH_TRAIN_r05_accum128.json 2400 \
  python bench_train.py --skip-fit --batch 128 --set grad_accum_steps=4

echo "=== r5i queue done $(date +%H:%M:%S) ===" >&2
