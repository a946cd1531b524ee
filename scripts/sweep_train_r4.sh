#!/bin/bash
# Round-4 train-step perf campaign (VERDICT r3 Next #1): batch-size sweep
# x remat arms x broadcast/donate A/Bs, serialized on the one chip.
# Each arm is its own process (fresh dispatch queue); results append as
# JSON lines to .sweeps/train_r4.jsonl for the VALIDATION table.
set -u
echo $$ > /tmp/sweep_train.pid   # chip_queue_r4.sh serializes on this
mkdir -p /root/repo/.sweeps
OUT=/root/repo/.sweeps/train_r4.jsonl
cd /root/repo

run() {
  tag="$1"; shift
  echo "=== $tag : bench_train.py $* ===" >&2
  line=$(timeout 1500 python bench_train.py --skip-fit "$@" 2>/root/repo/.sweeps/last_stderr.log)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    echo "{\"arm\": \"$tag\", \"result\": $line}" >> "$OUT"
    echo "$tag -> $line" >&2
  else
    echo "{\"arm\": \"$tag\", \"error\": $rc}" >> "$OUT"
    echo "$tag FAILED rc=$rc (see .sweeps/last_stderr.log)" >&2
    tail -3 /root/repo/.sweeps/last_stderr.log >&2
  fi
}

# Every arm pins remat/policy EXPLICITLY: the recorded .sweeps/train_r4.jsonl
# was produced when the config default was remat_steps=False; the sweep's
# results then flipped the default to remat+dots, so a re-run relying on
# defaults would silently measure different programs than the arm labels say.
run "b16_base"            --batch 16 --no-remat
run "b16_remat_full"      --batch 16 --remat --set remat_policy=full
run "b16_remat_dots"      --batch 16 --remat --set remat_policy=dots
run "b32_remat_dots"      --batch 32 --remat --set remat_policy=dots
run "b32_remat_full"      --batch 32 --remat --set remat_policy=full
run "b64_remat_dots"      --batch 64 --remat --set remat_policy=dots
run "b16_broadcast"       --batch 16 --no-remat --set scan_broadcast_inputs=True
run "b16_donate"          --batch 16 --no-remat --donate-batch
echo "sweep done" >&2
