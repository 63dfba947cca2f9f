#!/bin/bash
# Round-3 post-RD chip sequence: runs AFTER runs/rd/rd_report.json exists
# (the rd_watch.sh watcher exits on the same condition), serialized on the
# one-process-per-chip rule:
#   1. trained-weights bench on real-motion synthetic frames (VERDICT #6)
#   2. int8_packed serving-mode bench (self-calibrating)
#   3. int8 RD eval: eval-only rerun adding the bf16-vs-int8 BD-rate delta
# Logs to runs/post_rd_r3.log.
#
# Usage: nohup bash tools/round3_post_rd.sh <rd_pidfile> [steps-intra]
#            [steps-video] > /dev/null 2>&1 &
set -u
PIDFILE="${1:?rd driver pidfile}"
SI="${2:-400}"
SV="${3:-800}"
cd "$(dirname "$0")/.."
LOG=runs/post_rd_r3.log

while [ ! -f runs/rd/rd_report.json ]; do sleep 120; done
# let the driver process finish writing/exit before taking the chip
while kill -0 "$(cat "$PIDFILE" 2>/dev/null)" 2>/dev/null; do sleep 30; done

CKPT="$(ls runs/rd/video_l0p003_cascade_step*.npz 2>/dev/null | tail -1)"
{
  echo "=== $(date +%T) trained-weights bench (ckpt=$CKPT)"
  [ -n "$CKPT" ] && timeout 2400 python bench.py --ckpt "$CKPT" \
      --video synthetic
  echo "=== $(date +%T) int8_packed bench"
  timeout 3000 python bench.py --mode int8_packed
  echo "=== $(date +%T) int8 RD eval (bf16 vs int8 BD delta)"
  timeout 3600 python tools/rd_experiment.py --out runs/rd --eval-only \
      --steps-intra "$SI" --steps-video "$SV" --modes bf16 int8 \
      --report-name rd_report_int8.json 2>&1 | tail -30
  echo "=== $(date +%T) done"
} >> "$LOG" 2>&1
