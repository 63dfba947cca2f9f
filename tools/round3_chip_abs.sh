#!/bin/bash
# Round-3 chip A/B sequence — run ONLY when no other process owns the
# TPU (one-process-per-chip; see .claude/skills/verify).  Serializes:
#   1. int8 conv-stack microbench (north-star prototype number)
#   2. bench.py baseline (bf16_packed, planar warp stores)
#   3. bench.py with LSSVC_WARP_NHWC_OUT=1 (MXU identity-dot transpose)
#   4. bench.py with LSSVC_WARP_NHWC_OUT=t (Mosaic relayout transpose)
# Logs to runs/chip_abs_r3.log; each bench prints one JSON line.
set -u
cd "$(dirname "$0")/.."
LOG=runs/chip_abs_r3.log
{
  echo "=== $(date +%T) int8_bench"
  timeout 1200 python tools/int8_bench.py
  echo "=== $(date +%T) bench baseline"
  timeout 1800 python bench.py
  echo "=== $(date +%T) bench LSSVC_WARP_NHWC_OUT=1"
  LSSVC_WARP_NHWC_OUT=1 timeout 1800 python bench.py
  echo "=== $(date +%T) bench LSSVC_WARP_NHWC_OUT=t"
  LSSVC_WARP_NHWC_OUT=t timeout 1500 python bench.py
  echo "=== $(date +%T) done"
} >> "$LOG" 2>&1
