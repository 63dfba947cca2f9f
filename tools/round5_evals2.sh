#!/bin/bash
# Round-5 eval takeover: runs AFTER tools/round5_scratch.sh's E1/E2
# benches (the queue is killed at that point).  Reorders the remaining
# evidence by round-4 VERDICT priority — int8 e2e (#3) BEFORE the
# ref-scale eval (#4), then the GOP-6 trained RD eval with whatever
# window remains — because the in-queue order would let a long gop6 run
# starve int8 again (the round-4 failure mode).
#
# Usage: [CHIP_DEADLINE=<epoch>] setsid bash tools/round5_evals2.sh \
#            > /dev/null 2>&1 & echo $! > /tmp/r5evals2.pid
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_evals2.log
DEADLINE="${CHIP_DEADLINE:-1787297400}"   # 2026-08-21 07:30 UTC
INTRA_STEP="${INTRA_STEP:-4000}"
FT_STEP="${FT_STEP:-300}"

run_step() {
  local max="$1" label="$2"; shift 2
  local now rem
  now="$(date +%s)"; rem=$((DEADLINE - now))
  if [ "$rem" -lt 300 ]; then
    echo "=== $(date +%T) SKIP (deadline) $label" >> "$LOG"
    return 1
  fi
  [ "$rem" -lt "$max" ] && max="$rem"
  echo "=== $(date +%T) $label (cap ${max}s)" >> "$LOG"
  timeout -k 60 "$max" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== $(date +%T) rc=$rc $label" >> "$LOG"
  return $rc
}

echo "=== $(date +%T) eval takeover start (deadline=$DEADLINE, intra=$INTRA_STEP, ft=$FT_STEP)" >> "$LOG"

# 1. int8 e2e (VERDICT #3): random init first (no ckpt dependency),
#    then trained
run_step 1800 "int8_packed bench (random init)" \
  python bench.py --mode int8_packed --video synthetic
run_step 1800 "int8_packed bench (trained ckpt)" \
  python bench.py --mode int8_packed \
    --ckpt "runs/rd2/video_l0p01_ft_step${FT_STEP}.npz" --video synthetic

# 2. reference-scale eval (VERDICT #4): fixture pre-generated; per-point
#    runs, first point pays the 1080p stream-codec compile
i=0
for lam in 0p003 0p01 0p03 0p09; do
  run_step 2700 "ref-scale rate point l$lam (96f 1080p GOP32)" \
    python test.py --test_config runs/ref_scale5/config.json \
      --i_frame_model_path "runs/rd2/intra_l${lam}_step${INTRA_STEP}.npz" \
      --model_path "runs/rd2/video_l${lam}_ft_step${FT_STEP}.npz" \
      --write_stream 1 --precision bf16 --ratios x2 --worker 1 \
      --stream_path "runs/ref_scale5/bins_p$i" \
      --output_path "runs/ref_scale5/out_p$i"
  i=$((i + 1))
done
if ls runs/ref_scale5/out_p*/x2_FL.json > /dev/null 2>&1; then
  run_step 300 "ref-scale merge" \
    python tools/ref_scale_merge.py runs/ref_scale5/out_p* \
      --out runs/ref_scale5/out
fi

# 3. GOP-6 RD eval with the retrained video fts (fp32+bf16) — per-point
#    JSONs land as written; rd_reconstruct can rebuild a report from the
#    log if the deadline kills the driver
run_step 5400 "gop6 v2 RD eval (fp32+bf16)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only \
    --steps-intra "$INTRA_STEP" --steps-base 500 --steps-ft "$FT_STEP" \
    --frames 12 --gop 6 --eval-size 256 --modes fp32 bf16 \
    --report-name rd_report_v2.json

# 4. estimated-vs-real bpp gap (VERDICT #7)
run_step 2700 "estimated-bpp gop6 eval (bf16)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only --estimated \
    --steps-intra "$INTRA_STEP" --steps-base 500 --steps-ft "$FT_STEP" \
    --frames 12 --gop 6 --eval-size 256 --modes bf16 \
    --report-name rd_report_v2_estimated.json

# 5. kernel A/Bs (VERDICT #6) if the window still has room
run_step 1500 "full-model packed-ctx A/B (LSSVC_PACKED_CTX=1)" \
  env LSSVC_PACKED_CTX=1 python bench.py --video synthetic
run_step 1500 "batch-2 staged aggregate fps" \
  python bench.py --batch 2 --staged
echo "=== $(date +%T) eval takeover done" >> "$LOG"
