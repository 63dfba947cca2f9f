#!/bin/bash
# Round-3 post-RD2 chip sequence: runs AFTER runs/rd2/rd_report.json
# exists (the rd_watch.sh watcher exits on the same condition),
# serialized on the one-process-per-chip rule:
#   1. trained-weights bench (FT checkpoint, real-motion synthetic frames)
#   2. int8_packed serving-mode bench at the default 1080p config
#      (calibration-shape fix: cal dims rounded to /128)
#   3. int8 RD eval on the rd2 checkpoints: bf16-vs-int8 BD-rate delta
# Logs to runs/post_rd2_r3.log.
#
# Usage: nohup bash tools/round3_post_rd2.sh <rd2 pidfile> > /dev/null 2>&1 &
set -u
PIDFILE="${1:?rd2 driver pidfile}"
cd "$(dirname "$0")/.."
LOG=runs/post_rd2_r3.log

while [ ! -f runs/rd2/rd_report.json ]; do sleep 120; done
# let the driver process finish writing/exit before taking the chip
while kill -0 "$(cat "$PIDFILE" 2>/dev/null)" 2>/dev/null; do sleep 30; done

CKPT="$(ls runs/rd2/video_l0p01_ft_step*.npz 2>/dev/null | grep -v state | tail -1)"
{
  echo "=== $(date +%T) trained-weights bench (ckpt=$CKPT)"
  [ -n "$CKPT" ] && timeout 2400 python bench.py --ckpt "$CKPT" \
      --video synthetic --tier-stats
  echo "=== $(date +%T) int8_packed bench (1080p default)"
  timeout 3600 python bench.py --mode int8_packed
  echo "=== $(date +%T) int8 RD eval (bf16 vs int8 BD delta, rd2 ckpts)"
  timeout 3600 python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 2000 --steps-base 2400 --steps-ft 600 \
      --modes bf16 int8 --report-name rd_report_int8.json 2>&1 | tail -30
  echo "=== $(date +%T) done"
} >> "$LOG" 2>&1
