#!/bin/bash
# Round-5 video retrain queue: fix the round-4 flow explosion (mv stage
# had only 60 steps) by boosting the motion stage, then re-running full /
# cascade / per-lambda fine-tunes from the boosted base.
#
# Design (round-4 VERDICT #5 lessons): every stage is capped with
# `timeout -k`, saves partial checkpoints (--save-every well below the
# stage length), resumes idempotently (--skip-if-done + crash-resume),
# and later stages start from the NEWEST checkpoint the earlier stage
# actually produced — a deadline-killed stage degrades the recipe, never
# the queue.  All four fine-tunes share one executable (lambda is a
# traced scalar), so only 3 fresh stage graphs pay the ~30 min remote
# compile.
#
# Usage: nohup bash tools/round5_video.sh > runs/r5_video_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_video_queue.log

latest() {  # newest step checkpoint for an out-prefix, or empty
  ls -t "$1"_step*.npz 2>/dev/null | grep -v '\.state\.' | head -1
}

run_step() {
  local max="$1" label="$2"; shift 2
  echo "=== $(date +%T) $label (cap ${max}s)" >> "$LOG"
  timeout -k 60 "$max" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) rc=$? $label" >> "$LOG"
}

# 1. mv boost (already launched separately in round 5; skip-if-done)
run_step 3600 "mv boost 600" \
  python train.py --stage mv --steps 600 --lmbda 0.01 --crop 256 \
    --batch-per-device 1 --resume runs/rd2/base_cascade_step240.npz \
    --out runs/rd2/v2_mv --save-every 200 --lr-decay-steps 600 \
    --skip-if-done

MV="$(latest runs/rd2/v2_mv)"
[ -z "$MV" ] && MV=runs/rd2/base_cascade_step240.npz

# 2. full single-frame RD from the boosted motion base
run_step 7200 "full 1000" \
  python train.py --stage full --steps 1000 --lmbda 0.01 --crop 256 \
    --batch-per-device 1 --resume "$MV" \
    --out runs/rd2/v2_full --save-every 250 --lr-decay-steps 1000 \
    --skip-if-done

FULL="$(latest runs/rd2/v2_full)"
[ -z "$FULL" ] && FULL="$MV"

# 3. cascade (alternating warm/plain chunks) at the base lambda
run_step 7200 "cascade 500" \
  python train.py --stage cascade --frames 3 --steps 500 --lmbda 0.01 \
    --crop 256 --batch-per-device 1 --resume "$FULL" \
    --out runs/rd2/v2_cascade --save-every 125 --lr-decay-steps 500 \
    --skip-if-done

BASE="$(latest runs/rd2/v2_cascade)"
[ -z "$BASE" ] && BASE="$FULL"
echo "=== $(date +%T) base for fine-tunes: $BASE" >> "$LOG"

# 4. per-lambda cascade fine-tunes (shared executable: lambda is traced)
for lam in 0p003 0p01 0p03 0p09; do
  l="$(echo "$lam" | tr p .)"
  run_step 4500 "ft l$lam 300" \
    python train.py --stage cascade --frames 3 --steps 300 --lmbda "$l" \
      --crop 256 --batch-per-device 1 --resume "$BASE" \
      --out "runs/rd2/video_l${lam}_ft" --save-every 100 \
      --lr-decay-steps 300 --skip-if-done
done
echo "=== $(date +%T) video retrain queue done" >> "$LOG"
