#!/bin/bash
# Round-5 final eval queue (post DPB-sanitize + mid-warp-tier).
# Order: ref-scale (VERDICT #4, three-round slipper, now unblocked by the
# recurrence sanitize) -> trained bench (mid-tier A/B; also pre-warms the
# driver's bench executable, which the new cond structure invalidated) ->
# int8 e2e (#3) -> gop6 trained RD, bf16 (whatever window remains).
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_evals3.log
DEADLINE="${CHIP_DEADLINE:-1787298600}"   # 2026-08-21 07:50 UTC

run_step() {
  local max="$1" label="$2"; shift 2
  local now rem
  now="$(date +%s)"; rem=$((DEADLINE - now))
  if [ "$rem" -lt 240 ]; then
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

echo "=== $(date +%T) eval3 start (deadline=$DEADLINE)" >> "$LOG"

i=0
for lam in 0p003 0p01 0p03 0p09; do
  run_step 2700 "ref-scale rate point l$lam (96f 1080p GOP32)" \
    python test.py --test_config runs/ref_scale5/config.json \
      --i_frame_model_path "runs/rd2/intra_l${lam}_step4000.npz" \
      --model_path "runs/rd2/video_l${lam}_ft_step300.npz" \
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

run_step 2400 "trained bench (mid warp tier)" \
  python bench.py --ckpt runs/rd2/video_l0p01_ft_step300.npz \
    --video synthetic

run_step 1800 "int8_packed bench (random init)" \
  python bench.py --mode int8_packed --video synthetic

run_step 3600 "gop6 v2 RD eval (bf16)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only \
    --steps-intra 4000 --steps-base 500 --steps-ft 300 \
    --frames 12 --gop 6 --eval-size 256 --modes bf16 \
    --report-name rd_report_v2.json
echo "=== $(date +%T) eval3 done" >> "$LOG"
