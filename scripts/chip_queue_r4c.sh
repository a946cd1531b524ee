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

left() { echo $(( DEADLINE - $(date +%s) )); }

record() {  # record <tag> <rc> ; embeds .sweeps/<tag>.out's last line
  tag="$1"; rc="$2"
  out=$(tail -1 .sweeps/"$tag".out 2>/dev/null)
  python - "$tag" "$rc" "$out" >> "$RES" <<'PYEOF'
import json, sys
tag, rc, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
try:
    rec = {"run": tag, "out": json.loads(out)}
    if rc != 0:
        rec["error"] = f"rc{rc}"
except Exception:
    rec = {"run": tag, "raw": out} if rc == 0 else {"run": tag, "error": f"rc{rc}", "raw": out}
print(json.dumps(rec))
PYEOF
}

run() {  # run <tag> <timeout_s> <cmd...>
  tag="$1"; to="$2"; shift 2
  rem=$(left)
  if [ "$rem" -lt 120 ]; then
    echo "SKIP $tag: ${rem}s left" >&2
    echo "{\"run\": \"$tag\", \"error\": \"skipped_deadline\"}" >> "$RES"
    return
  fi
  [ "$to" -gt "$rem" ] && to=$rem
  echo "--- $tag: timeout=$to $* ($(date +%H:%M:%S)) ---" >&2
  timeout "$to" "$@" >.sweeps/"$tag".out 2>.sweeps/"$tag".stderr
  rc=$?
  record "$tag" "$rc"
  if [ $rc -eq 0 ]; then
    echo "$tag OK: $(tail -1 .sweeps/"$tag".out)" >&2
  else
    [ $rc -eq 124 ] && why=timeout || why=rc$rc
    echo "$tag FAILED ($why)" >&2; tail -4 .sweeps/"$tag".stderr >&2
  fi
}

sweep_arm() {  # sweep_arm <tag> <bench_train args...> -> .sweeps/train_r4.jsonl
  tag="$1"; shift
  rem=$(left)
  if [ "$rem" -lt 120 ]; then
    echo "{\"arm\": \"$tag\", \"error\": \"skipped_deadline\"}" >> .sweeps/train_r4.jsonl
    return
  fi
  to=1500; [ "$to" -gt "$rem" ] && to=$rem
  echo "=== arm $tag : bench_train.py --skip-fit $* ($(date +%H:%M:%S)) ===" >&2
  line=$(timeout "$to" python bench_train.py --skip-fit "$@" 2>.sweeps/last_stderr.log)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    echo "{\"arm\": \"$tag\", \"result\": $line}" >> .sweeps/train_r4.jsonl
    echo "$tag -> $line" >&2
  else
    echo "{\"arm\": \"$tag\", \"error\": $rc}" >> .sweeps/train_r4.jsonl
    echo "$tag FAILED rc=$rc" >&2; tail -3 .sweeps/last_stderr.log >&2
  fi
}

echo "=== queue v3 start $(date +%H:%M:%S), deadline in $(left)s ===" >&2

# 0. Wait for the in-flight bench.py verify run (the relay serializes).
if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  echo "wait pid $WAIT_PID drained ($(date +%H:%M:%S))" >&2
fi

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
