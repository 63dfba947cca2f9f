#!/bin/bash
# Round-4 chip queue, phase 2 (after the RD report landed 08:11 UTC).
#
# The run-3 RD curves came out quality-degenerate: every lambda sits at
# ~(0.67 bpp, 13.5 dB) because the window-sized recipe (400 intra /
# 100 ft steps) is far from convergence, so there is no rate separation
# and the 4-point BD fit is numerically meaningless.  The cheap rescue:
# the intra path trains at ~15 steps/s on-chip (the video stages at
# ~0.3-0.8 steps/s are NOT extendable in-window), so a deep intra boost
# (400 -> 4000 steps/lambda, ~4.5 min each, same-stage crash-resume
# keeps Adam state) followed by a GOP-1 all-intra eval yields genuinely
# lambda-separated monotonic RD curves and a valid bf16-vs-fp32 BD
# delta.  That serves VERDICT #1's "monotonic curves + BD delta" clause
# directly, so it runs FIRST; benches (#3/#4) follow; ref-scale (#5) and
# diagnostics take the tail the deadline allows.
#
# Usage: [CHIP_DEADLINE=<epoch>] nohup bash tools/round4_chip2.sh \
#            [wait_pid] > /dev/null 2>&1 &
# wait_pid: an in-flight chip process (e.g. the orphaned trained-weights
# bench from phase 1) to wait on before starting.
set -u
WAITPID="${1:-}"
cd "$(dirname "$0")/.."
LOG=runs/round4_chip.log
DEADLINE="${CHIP_DEADLINE:-1787219100}"   # default 2026-08-20 09:45 UTC

while [ -n "$WAITPID" ] && kill -0 "$WAITPID" 2>/dev/null; do
  [ "$(date +%s)" -ge "$DEADLINE" ] && exit 0
  sleep 20
done

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

echo "=== $(date +%T) phase-2 queue start (deadline=$DEADLINE)" >> "$LOG"

# 1. deep intra boost: same --out => crash-resume (Adam state + step 400
# restored), fresh 4000-step cosine so LR comes back up for the long leg
for lam in 0p003 0p01 0p03 0p09; do
  l="$(echo "$lam" | tr p .)"
  run_step 700 "boost intra l$lam 400->4000" \
    python train.py --loss intra --steps 4000 --lmbda "$l" --crop 256 \
      --batch-per-device 1 --resume "runs/rd2/intra_l${lam}_step400.npz" \
      --out "runs/rd2/intra_l${lam}" --save-every 4000 \
      --lr-decay-steps 4000 --skip-if-done
done

INTRA_STEP=400
ok=1
for lam in 0p003 0p01 0p03 0p09; do
  [ -f "runs/rd2/intra_l${lam}_step4000.npz" ] || ok=0
done
[ "$ok" = 1 ] && INTRA_STEP=4000
echo "=== $(date +%T) intra ckpt step for evals: $INTRA_STEP" >> "$LOG"

# 2. GOP-1 all-intra RD eval: the monotonic-curve + bf16 BD artifact
if [ "$INTRA_STEP" = 4000 ]; then
  run_step 1800 "gop1 intra RD eval (fp32+bf16)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 4000 --steps-base 480 --steps-ft 100 \
      --frames 12 --gop 1 --eval-size 256 --modes fp32 bf16 \
      --report-name rd_report_intra_gop1.json
fi

# 3-4. remaining VERDICT #3 benches (trained bench ran in phase 1)
run_step 1800 "int8_packed bench (trained ckpt)" \
  python bench.py --mode int8_packed \
    --ckpt runs/rd2/video_l0p01_ft_step100.npz --video synthetic
run_step 1500 "batch-of-sequences aggregate fps (staged, batch 2)" \
  python bench.py --batch 2 --staged

# 5. reference-scale eval, one test.py run per rate point (kill-safe)
run_step 600 "ref-scale fixture (96f 1080p YUV + config)" \
  python tools/ref_scale_eval.py --out runs/ref_scale
for i in 0 1 2 3; do
  lam="$(echo 0p003 0p01 0p03 0p09 | cut -d' ' -f$((i + 1)))"
  run_step 2100 "ref-scale rate point l$lam (96f 1080p GOP32)" \
    python test.py --test_config runs/ref_scale/config.json \
      --i_frame_model_path "runs/rd2/intra_l${lam}_step${INTRA_STEP}.npz" \
      --model_path "runs/rd2/video_l${lam}_ft_step100.npz" \
      --write_stream 1 --precision bf16 --ratios x2 --worker 1 \
      --stream_path "runs/ref_scale/bins_p$i" \
      --output_path "runs/ref_scale/out_p$i"
done
python tools/ref_scale_merge.py runs/ref_scale/out_p* \
  --out runs/ref_scale/out >> "$LOG" 2>&1

# 6. int8 RD eval (per-point int8-vs-bf16 deltas; BD only if separated)
run_step 1500 "int8 RD eval (bf16 vs int8)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only \
    --steps-intra "$INTRA_STEP" --steps-base 480 --steps-ft 100 \
    --frames 12 --gop 6 --eval-size 256 --modes bf16 int8 \
    --report-name rd_report_int8.json

# 7. GOP-6 re-eval with the deep intra ckpts (better I references)
if [ "$INTRA_STEP" = 4000 ]; then
  run_step 1200 "gop6 deep-intra re-eval (fp32+bf16)" \
    python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 4000 --steps-base 480 --steps-ft 100 \
      --frames 12 --gop 6 --eval-size 256 --modes fp32 bf16 \
      --report-name rd_report_deepintra.json
fi

# 8. tail: kernel A/Bs
run_step 1500 "warp packed-out boundary A/B" \
  python tools/warp_overhead_bench.py pack_after packed_out \
    grouped_pack_after grouped_packed_out
run_step 1500 "full-model packed-ctx A/B (LSSVC_PACKED_CTX=1)" \
  env LSSVC_PACKED_CTX=1 python bench.py
echo "=== $(date +%T) phase-2 done" >> "$LOG"
