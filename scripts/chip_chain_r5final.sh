#!/bin/bash
# Final round-5 chip chain: wait for the r5i artifact queue, then
#   1. prime the serving/latency programs + record the round-5 headline
#      (bench.py — populates .jax_cache so the driver's end-of-round
#      bench run compiles warm on this fresh VM),
#   2. run the r5j serving batch x scoped-VMEM interaction sweep with
#      whatever chip time remains.
# Usage: WAIT_PID=<r5i pid> DEADLINE=<epoch> nohup bash scripts/chip_chain_r5final.sh > /tmp/chain_r5final.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r5final_results.jsonl
DEADLINE=${DEADLINE:-$(( $(date +%s) + 7200 ))}
WAIT_PID=${WAIT_PID:-0}

. "$(dirname "$0")/_queue_lib.sh"  # left / record / run / drain_pid

drain_pid "$WAIT_PID"
echo "=== r5final chain start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

run bench_headline_r5 2400 python bench.py
tail -1 .sweeps/bench_headline_r5.out > /tmp/bench_headline_r5.json && \
  python -c "import json;json.load(open('/tmp/bench_headline_r5.json'))" && \
  cp /tmp/bench_headline_r5.json .sweeps/bench_headline_r5.json && \
  echo "headline: $(cat /tmp/bench_headline_r5.json)" >&2

DEADLINE=$DEADLINE WAIT_PID=0 bash scripts/chip_queue_r5j.sh >> /tmp/queue_r5j.log 2>&1

echo "=== r5final chain done $(date +%H:%M:%S) ===" >&2
