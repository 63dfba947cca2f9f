#!/bin/bash
# Round-5 from-scratch chip queue.  The round-5 VM reset wiped runs/
# (all round-3/4 checkpoints and the compile cache), so every trained
# artifact must be regenerated inside this round's window.  Design per
# round-4 VERDICT #5/#6: every step is capped (timeout -k) AND
# deadline-aware (skipped/shrunk near the wall), partial checkpoints are
# saved frequently, later stages chain from the NEWEST checkpoint the
# earlier stage actually produced, and evals use the best COMMON step
# across lambdas (never an all-or-nothing gate).  Artifacts are written
# immediately per step; the driver session commits them as they land.
#
# Usage: [CHIP_DEADLINE=<epoch>] setsid nohup bash tools/round5_scratch.sh \
#            > /dev/null 2>&1 & echo $! > /tmp/r5queue.pid
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/rd2
LOG=runs/r5_scratch.log
DEADLINE="${CHIP_DEADLINE:-1787297400}"   # 2026-08-21 07:30 UTC

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

latest() {  # newest step checkpoint for an out-prefix, or empty
  ls -t "$1"_step*.npz 2>/dev/null | grep -v '\.state\.' | head -1
}

# run2: one retry on failure.  Remote compiles normally take 70-147 s but
# can wedge silently (round-4's "remote_compile: read body" drop, seen
# again at round-5 start: 30 min blocked, zero CPU); train.py stages are
# idempotent (--skip-if-done) and crash-resume from their own partial
# checkpoints, so a retry after a cap kill loses nothing.
run2() {
  run_step "$@" || run_step "$@"
}

best_common_step() {  # best_common_step <prefix-template with @LAM@> <steps...>
  local tpl="$1"; shift
  local s lam ok
  for s in "$@"; do
    ok=1
    for lam in 0p003 0p01 0p03 0p09; do
      [ -f "$(echo "$tpl" | sed "s/@LAM@/$lam/")_step${s}.npz" ] || ok=0
    done
    [ "$ok" = 1 ] && { echo "$s"; return 0; }
  done
  echo ""
}

echo "=== $(date +%T) round-5 from-scratch queue start (deadline=$DEADLINE)" >> "$LOG"

# ---- phase T: training ------------------------------------------------
# T1. per-lambda IntraSS from scratch (~15 steps/s; first run pays the
# cold compile)
for lam in 0p003 0p01 0p03 0p09; do
  l="$(echo "$lam" | tr p .)"
  run2 1500 "intra l$lam 4000 (scratch)" \
    python train.py --loss intra --steps 4000 --lmbda "$l" --crop 256 \
      --batch-per-device 1 --out "runs/rd2/intra_l${lam}" \
      --save-every 400 --lr-decay-steps 4000 --skip-if-done
done

# T2. shared video base at lambda 0.01: spynet -> mv -> full -> cascade
run2 2100 "spynet 600 (scratch)" \
  python train.py --stage spynet --steps 600 --lmbda 0.01 --crop 256 \
    --batch-per-device 1 --out runs/rd2/v2_spynet --save-every 200 \
    --lr-decay-steps 600 --skip-if-done
SPY="$(latest runs/rd2/v2_spynet)"

run2 2700 "mv 600" \
  python train.py --stage mv --steps 600 --lmbda 0.01 --crop 256 \
    --batch-per-device 1 ${SPY:+--resume "$SPY"} \
    --out runs/rd2/v2_mv --save-every 200 --lr-decay-steps 600 \
    --skip-if-done
MV="$(latest runs/rd2/v2_mv)"; [ -z "$MV" ] && MV="$SPY"

run2 3900 "full 1000" \
  python train.py --stage full --steps 1000 --lmbda 0.01 --crop 256 \
    --batch-per-device 1 ${MV:+--resume "$MV"} \
    --out runs/rd2/v2_full --save-every 250 --lr-decay-steps 1000 \
    --skip-if-done
FULL="$(latest runs/rd2/v2_full)"; [ -z "$FULL" ] && FULL="$MV"

run2 3900 "cascade 500 (alternating warm/plain)" \
  python train.py --stage cascade --frames 3 --steps 500 --lmbda 0.01 \
    --crop 256 --batch-per-device 1 ${FULL:+--resume "$FULL"} \
    --out runs/rd2/v2_cascade --save-every 125 --lr-decay-steps 500 \
    --skip-if-done
BASE="$(latest runs/rd2/v2_cascade)"; [ -z "$BASE" ] && BASE="$FULL"
echo "=== $(date +%T) base for fine-tunes: $BASE" >> "$LOG"

# T3. per-lambda cascade fine-tunes (lambda is traced: one executable)
if [ -n "$BASE" ]; then
  for lam in 0p003 0p01 0p03 0p09; do
    l="$(echo "$lam" | tr p .)"
    run2 1800 "ft l$lam 300" \
      python train.py --stage cascade --frames 3 --steps 300 --lmbda "$l" \
        --crop 256 --batch-per-device 1 --resume "$BASE" \
        --out "runs/rd2/video_l${lam}_ft" --save-every 100 \
        --lr-decay-steps 300 --skip-if-done
  done
fi

INTRA_STEP="$(best_common_step runs/rd2/intra_l@LAM@ 4000 3600 3200 2800 2400 2000 1600 1200 800 400)"
FT_STEP="$(best_common_step runs/rd2/video_l@LAM@_ft 300 200 100)"
echo "=== $(date +%T) eval ckpt steps: intra=$INTRA_STEP ft=$FT_STEP" >> "$LOG"

# ---- phase E: evals/benches (priority = round-4 VERDICT order) --------
# E1. trained-weights bench + tier stats (VERDICT #2 acceptance)
if [ -n "$FT_STEP" ]; then
  run_step 2400 "trained bench + tier stats" \
    python bench.py --ckpt "runs/rd2/video_l0p01_ft_step${FT_STEP}.npz" \
      --video synthetic --tier-stats
fi

# E2. random-init comparator (also warms the driver-bench executable)
run_step 2400 "random-init bench (synthetic video)" \
  python bench.py --video synthetic

# E3. reference-scale eval: 96f 1080p GOP32, 4 rate points, real streams
if [ -n "$INTRA_STEP" ] && [ -n "$FT_STEP" ]; then
  run_step 900 "ref-scale fixture (96f 1080p YUV + config)" \
    python tools/ref_scale_eval.py --out runs/ref_scale5
  i=0
  for lam in 0p003 0p01 0p03 0p09; do
    run_step 3600 "ref-scale rate point l$lam (96f 1080p GOP32)" \
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
fi

# E4. GOP-6 RD eval with the retrained video fts (fp32+bf16)
if [ -n "$INTRA_STEP" ] && [ -n "$FT_STEP" ]; then
  run_step 5400 "gop6 v2 RD eval (fp32+bf16)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra "$INTRA_STEP" --steps-base 500 --steps-ft "$FT_STEP" \
      --frames 12 --gop 6 --eval-size 256 --modes fp32 bf16 \
      --report-name rd_report_v2.json
fi

# E5. int8 e2e (VERDICT #3): trained + random init
if [ -n "$FT_STEP" ]; then
  run_step 2400 "int8_packed bench (trained ckpt)" \
    python bench.py --mode int8_packed \
      --ckpt "runs/rd2/video_l0p01_ft_step${FT_STEP}.npz" --video synthetic
fi
run_step 2400 "int8_packed bench (random init)" \
  python bench.py --mode int8_packed --video synthetic

# E6. estimated-vs-real bpp gap on trained models (VERDICT #7)
if [ -n "$INTRA_STEP" ] && [ -n "$FT_STEP" ]; then
  run_step 2700 "estimated-bpp gop6 eval (bf16)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only --estimated \
      --steps-intra "$INTRA_STEP" --steps-base 500 --steps-ft "$FT_STEP" \
      --frames 12 --gop 6 --eval-size 256 --modes bf16 \
      --report-name rd_report_v2_estimated.json
fi

# E7. batch-2 aggregate + kernel A/Bs (VERDICT #6)
run_step 1800 "batch-2 staged aggregate fps" \
  python bench.py --batch 2 --staged
run_step 1800 "warp packed-out boundary A/B" \
  python tools/warp_overhead_bench.py pack_after packed_out \
    grouped_pack_after grouped_packed_out
run_step 1800 "full-model packed-ctx A/B (LSSVC_PACKED_CTX=1)" \
  env LSSVC_PACKED_CTX=1 python bench.py --video synthetic

# E8. int8 RD eval (per-point int8-vs-bf16 deltas)
if [ -n "$INTRA_STEP" ] && [ -n "$FT_STEP" ]; then
  run_step 3600 "int8 RD eval (bf16 vs int8)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra "$INTRA_STEP" --steps-base 500 --steps-ft "$FT_STEP" \
      --frames 12 --gop 6 --eval-size 256 --modes bf16 int8 \
      --report-name rd_report_v2_int8.json
fi

echo "=== $(date +%T) round-5 from-scratch queue done" >> "$LOG"
