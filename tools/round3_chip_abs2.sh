#!/bin/bash
# Round-3 chip sequence 2 (after round3_chip_abs.sh):
#   1. mosaic_repro — the grouped cblock kernel's row-planar store fix
#      must compile under the updated helper (the old dynamic-sublane
#      store is now rejected) and match the exact lowmem fallback
#   2. int8_bench — adds the all-integer fixed-point requant variant
# (The fixed-planar full bench was dropped: NHWC_OUT=1 is the measured
# default now; chip time goes to the RD experiment instead.)
# Logs to runs/chip_abs2_r3.log; run ONLY when no other process owns the
# TPU (one-process-per-chip).
set -u
cd "$(dirname "$0")/.."
LOG=runs/chip_abs2_r3.log
{
  echo "=== $(date +%T) mosaic_repro (grouped cblock store fix)"
  LSSVC_WARP_NHWC_OUT=0 timeout 900 python tools/mosaic_repro.py
  echo "=== $(date +%T) int8_bench (with int8_fx)"
  timeout 1200 python tools/int8_bench.py
  echo "=== $(date +%T) bench (new NHWC_OUT=1 default)"
  timeout 1800 python bench.py
  echo "=== $(date +%T) done"
} >> "$LOG" 2>&1
