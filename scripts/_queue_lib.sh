# Shared helpers for the serialized chip work queues (chip_queue_*.sh).
# Source AFTER setting RES (the results jsonl) and DEADLINE (epoch seconds);
# WAIT_PID is optional. The helpers diverged once across queue versions
# (the rc-through-pipe fix in 76db90c landed in v2+ but v1's step-8 block
# kept the piped pattern), so the booking logic lives here exactly once.
#
# Contract: every arm appends ONE json line to its results file whatever
# happens (ok / non-zero rc / timeout / skipped at the deadline), and the
# command's own rc is captured directly — never through a pipe, where
# `tail` would mask it.

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

drain_pid() {  # drain_pid <pid> — wait for the chip's current owner to exit
  # (the relay serializes clients; profiling/benchmarking alongside another
  # TPU process corrupts both measurements).
  pid="$1"
  [ "$pid" -gt 0 ] || return 0
  while kill -0 "$pid" 2>/dev/null; do sleep 15; done
  echo "wait pid $pid drained ($(date +%H:%M:%S))" >&2
}
