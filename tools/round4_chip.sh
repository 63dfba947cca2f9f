#!/bin/bash
# Round-4 post-RD chip sequence.  Waits for the RD pipeline to conclude
# (report written, or the driver+watchdog conclusively dead), then runs
# the serialized chip queue (ONE process on the TPU at a time), highest-
# value steps first:
#   1. trained-weights bench + warp-tier stats   (VERDICT #3/#6 evidence)
#   2. int8_packed end-to-end 1080p bench, trained ckpt
#   3. int8 RD eval on the rd2 checkpoints (bf16-vs-int8 BD delta)
#   4. batch-of-sequences aggregate fps (staged, batch 2)  (VERDICT #4;
#      before ref-scale: a 20-min measurement must not be starved by a
#      2-hour one)
#   5. reference-scale eval: 96-frame 1080p, GOP 32, 4 rate points,
#      real bitstreams                           (VERDICT #5)
#   6. int8_packed bench, random init
#   7. GOP-2 diagnostic eval (error-accumulation reference)
#   8. random-weights bench (1.583 fps continuity point; the round
#      driver re-runs this anyway, so it is late in the queue)
#   9. warp packed-out boundary A/B + full-model packed-ctx A/B
#
# Every step is capped by BOTH its own timeout and a hard wall-clock
# DEADLINE (env CHIP_DEADLINE): the round-3 bench (-1.56 fps) and
# multichip abort (rc=134) were collateral from a background loop still
# holding the host when the driver captured its round-end artifacts.
# Steps that would start with <5 min of budget are skipped (logged), and
# the queue exits before the deadline no matter what, leaving the chip
# idle for the driver.  Logs to runs/round4_chip.log.
#
# Usage: [CHIP_DEADLINE=<epoch>] nohup bash tools/round4_chip.sh \
#            <rd2 pidfile> > /dev/null 2>&1 &
set -u
PIDFILE="${1:?rd2 driver pidfile}"
cd "$(dirname "$0")/.."
LOG=runs/round4_chip.log
DEADLINE="${CHIP_DEADLINE:-1787212800}"   # default 2026-08-20 08:00 UTC

# Wait for the RD pipeline to conclude.  Three exits from this loop:
#   - report exists           -> proceed (then wait for driver exit)
#   - driver dead >6 checks   -> watchdog gave up (it relaunches within
#     120s, so ~6 min of continuous death means no relaunch is coming);
#     proceed with whatever checkpoints exist
#   - deadline                -> exit
dead_checks=0
while [ ! -f runs/rd2/rd_report.json ]; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && exit 0
  pid="$(cat "$PIDFILE" 2>/dev/null || true)"
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    dead_checks=0
  else
    dead_checks=$((dead_checks + 1))
    if [ "$dead_checks" -ge 6 ]; then
      echo "=== $(date +%T) RD driver dead ~6min with no report; proceeding" \
           "with existing checkpoints" >> "$LOG"
      break
    fi
  fi
  sleep 60
done
pid="$(cat "$PIDFILE" 2>/dev/null || true)"
while [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && exit 0
  sleep 30
done

# run_step <max_secs> <label> <cmd...>: cap by min(max_secs, deadline-now)
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
  timeout "$max" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) rc=$? $label" >> "$LOG"
}

CKPT="$(ls runs/rd2/video_l0p01_ft_step*.npz 2>/dev/null | grep -v state | tail -1)"
INTRA="$(ls runs/rd2/intra_l0p01_step*.npz 2>/dev/null | grep -v state | tail -1)"
echo "=== $(date +%T) round-4 chip queue start (deadline=$DEADLINE ckpt=$CKPT)" >> "$LOG"

if [ -n "$CKPT" ]; then
  run_step 2400 "1. trained-weights bench + tier stats" \
    python bench.py --ckpt "$CKPT" --video synthetic --tier-stats
  run_step 2400 "2. int8_packed bench (trained ckpt, synthetic motion)" \
    python bench.py --mode int8_packed --ckpt "$CKPT" --video synthetic
else
  echo "=== $(date +%T) SKIP trained-ckpt steps (no rd2 ft checkpoint)" >> "$LOG"
fi
if [ -n "$INTRA" ]; then
  run_step 2700 "3. int8 RD eval (bf16 vs int8 BD delta, rd2 ckpts)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 400 --steps-base 480 --steps-ft 100 \
      --modes bf16 int8 --report-name rd_report_int8.json
fi
run_step 1500 "4. batch-of-sequences aggregate fps (staged, batch 2)" \
  python bench.py --batch 2 --staged
if [ -n "$INTRA" ]; then
  run_step 900 "5-fixture. ref-scale 96f 1080p YUV + config" \
    python tools/ref_scale_eval.py --out runs/ref_scale
  # one test.py invocation PER rate point: test.py writes its JSON only
  # at the very end, so a single 4-point run killed at the deadline loses
  # everything; per-point runs keep every completed point (the compile
  # cache makes points 2-4 compile-free).  tools/ref_scale_merge.py
  # combines out_p*/ into the reference-schema x2_{BL,EL,FL}.json.
  for i in 0 1 2 3; do
    lam="$(echo 0p003 0p01 0p03 0p09 | cut -d' ' -f$((i + 1)))"
    run_step 2100 "5.$i ref-scale eval rate point l$lam (96f 1080p GOP32)" \
      python test.py --test_config runs/ref_scale/config.json \
        --i_frame_model_path "runs/rd2/intra_l${lam}_step400.npz" \
        --model_path "runs/rd2/video_l${lam}_ft_step100.npz" \
        --write_stream 1 --precision bf16 --ratios x2 --worker 1 \
        --stream_path "runs/ref_scale/bins_p$i" \
        --output_path "runs/ref_scale/out_p$i"
  done
  python tools/ref_scale_merge.py runs/ref_scale/out_p* \
    --out runs/ref_scale/out >> "$LOG" 2>&1
else
  echo "=== $(date +%T) SKIP rd-ckpt evals (no rd2 intra checkpoint)" >> "$LOG"
fi
run_step 1800 "6. int8_packed bench (random init)" \
  python bench.py --mode int8_packed
if [ -n "$INTRA" ]; then
  run_step 1800 "7. GOP-2 diagnostic eval (error-accumulation reference)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 400 --steps-base 480 --steps-ft 100 --gop 2 \
      --modes bf16 --report-name rd_report_gop2.json
fi
run_step 1200 "8. random-weights bench (known 1.583 ref point)" \
  python bench.py
run_step 1800 "9a. warp packed-out boundary A/B" \
  python tools/warp_overhead_bench.py pack_after packed_out \
    grouped_pack_after grouped_packed_out
run_step 1800 "9b. full-model packed-ctx A/B (LSSVC_PACKED_CTX=1)" \
  env LSSVC_PACKED_CTX=1 python bench.py
echo "=== $(date +%T) done" >> "$LOG"
