#!/bin/bash
# Round-4 chip work queue (VERDICT r3 Next #2/#5/#7/#8): drains all
# remaining single-chip runs serially after the train sweep finishes.
# SUPERSEDED pattern: later queues (v2+) source scripts/_queue_lib.sh for
# the booking helpers (deadline guard, rc-direct capture) — start there.
# Every run appends to .sweeps/ so a dead session loses nothing.
# The relay serializes the chip — NOTHING else may use the TPU meanwhile.
set -u
cd /root/repo
# Append (never replace — CLAUDE.md) so scripts/*.py can import step_tpu even
# though their sys.path[0] is scripts/. The r4 queue forgot this and burned
# 7 runs on ModuleNotFoundError; scripts now also self-bootstrap.
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p .sweeps
RES=.sweeps/r4_results.jsonl

# Wait for the train sweep (scripts/sweep_train_r4.sh) if it is running.
if [ -f /tmp/sweep_train.pid ]; then
  pid=$(cat /tmp/sweep_train.pid)
  while kill -0 "$pid" 2>/dev/null; do sleep 20; done
fi
echo "=== chip queue start $(date +%H:%M:%S) ===" >&2

run() {  # run <tag> <timeout_s> <cmd...>
  tag="$1"; to="$2"; shift 2
  echo "--- $tag: $* ($(date +%H:%M:%S)) ---" >&2
  timeout "$to" "$@" >.sweeps/"$tag".out 2>.sweeps/"$tag".stderr
  rc=$?   # the command's own status (no pipeline — tail would mask it)
  out=$(tail -1 .sweeps/"$tag".out)
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    # Embed only after validating the line IS JSON; else record it quoted.
    python - "$tag" "$out" >> "$RES" <<'PYEOF'
import json, sys
tag, out = sys.argv[1], sys.argv[2]
try:
    print(json.dumps({"run": tag, "out": json.loads(out)}))
except Exception:
    print(json.dumps({"run": tag, "raw": out}))
PYEOF
    echo "$tag OK: $out" >&2
  else
    [ $rc -eq 124 ] && why=timeout || why=rc$rc
    python - "$tag" "$why" >> "$RES" <<'PYEOF'
import json, sys
print(json.dumps({"run": sys.argv[1], "error": sys.argv[2]}))
PYEOF
    echo "$tag FAILED ($why)" >&2; tail -4 .sweeps/"$tag".stderr >&2
  fi
}

# 1. Same-class multi-actor oracle (official matcher bites) + both linkers.
run same_class_r4 3600 python scripts/train_eval_synth.py \
  --tag same_class_r4 --same-class-actors --video-eval 12 \
  --save-variables .sweeps/same_class_vars.msgpack

# 2. two_stream re-baseline under the official matcher.
run two_stream_r4 3600 python scripts/train_eval_synth.py \
  --tag two_stream_r4 --set two_stream=True \
  --save-variables .sweeps/two_stream_vars.msgpack

# 3. Adaptive-ROI mAP A/B: same weights, sampling_ratio=2 (fixed, already
#    recorded in arm 2) vs 0 (adaptive ceil(roi/bin)) at eval time.
run roi_adaptive_r4 1800 python scripts/train_eval_synth.py \
  --tag roi_adaptive_r4 --load-variables .sweeps/same_class_vars.msgpack \
  --same-class-actors --set sampling_ratio=0

# 4. Production fit() journey re-baseline: train.py -> orbax ckpt ->
#    fresh-process restore -> eval (the 0.949 number, post-matcher-fix).
rm -rf .sweeps/fit_ckpt_r4 .sweeps/fit_log_r4
run fit_train_r4 5400 python train.py --dataset synthetic --image-size 112 \
  --batch-size 8 --lr 1e-3 --steps 1500 --epochs 24 \
  --ckpt-dir .sweeps/fit_ckpt_r4 --log-dir .sweeps/fit_log_r4 \
  --set max_gt_tubes=2,warmup_steps=100
run fit_eval_r4 1800 python scripts/train_eval_synth.py \
  --tag fit_journey_r4 --load-ckpt-dir .sweeps/fit_ckpt_r4 \
  --steps 1500 --eval-clips 64

# 5. Serving sweep: batch re-sweep + scoped-VMEM compiler A/B (prints a
#    table, not JSON — keep the whole stdout).
echo "--- bench_sweep ($(date +%H:%M:%S)) ---" >&2
timeout 3600 python scripts/bench_sweep.py \
  > .sweeps/bench_sweep_r4.txt 2>.sweeps/bench_sweep_r4.stderr
echo "bench_sweep rc=$? ; table:" >&2; cat .sweeps/bench_sweep_r4.txt >&2

# 6. Streaming linking stress at L=64.
run stream_r4 2400 python scripts/bench_linking_stream.py --clips 64

# 7. ava60@224 re-baseline (longest — last so earlier results survive).
run ava60_224_r4 9000 python scripts/train_eval_synth.py \
  --tag ava60_224_r4 --classes 60 --image-size 224 \
  --set multilabel=True,num_classes=60 --steps 1500 \
  --save-variables .sweeps/ava60_vars.msgpack

# 8. Recorded train benchmark artifact (default arm, full run incl. fit).
#    rc is taken from the command itself (not the tail) and the tracked
#    artifact is only replaced once the output validates as JSON — a crash
#    or timeout must never truncate the committed BENCH_TRAIN_r04.json.
echo "--- bench_train full ($(date +%H:%M:%S)) ---" >&2
timeout 2400 python bench_train.py \
  > .sweeps/bench_train_full.out 2>.sweeps/bench_train_full.stderr
rc=$?
tail -1 .sweeps/bench_train_full.out > /tmp/bench_train_r04.json
if [ $rc -eq 0 ] && python -c "import json; json.load(open('/tmp/bench_train_r04.json'))" 2>/dev/null; then
  cp /tmp/bench_train_r04.json BENCH_TRAIN_r04.json
  echo "bench_train OK: $(cat BENCH_TRAIN_r04.json)" >&2
else
  echo "bench_train FAILED rc=$rc (artifact left untouched)" >&2
  tail -4 .sweeps/bench_train_full.stderr >&2
fi

# 9. Headline inference bench (driver contract sanity).
echo "--- bench.py ($(date +%H:%M:%S)) ---" >&2
timeout 2400 python bench.py \
  > .sweeps/bench_headline.out 2>.sweeps/bench_headline.stderr
rc=$?
tail -1 .sweeps/bench_headline.out > .sweeps/bench_headline_r4.json
echo "bench rc=$rc: $(cat .sweeps/bench_headline_r4.json)" >&2
echo "=== chip queue done $(date +%H:%M:%S) ===" >&2
