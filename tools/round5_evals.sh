#!/bin/bash
# Round-5 eval/bench queue — runs AFTER tools/round5_video.sh lands the
# retrained checkpoints.  Every step is independently capped and writes
# its artifact immediately; steps are ordered by VERDICT r4 priority
# (RD evidence first, then serving benches, then ref-scale, then A/Bs).
#
# Usage: nohup bash tools/round5_evals.sh > runs/r5_evals.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=runs/r5_evals.log
FT_STEP="${FT_STEP:-300}"

run_step() {
  local max="$1" label="$2"; shift 2
  echo "=== $(date +%T) $label (cap ${max}s)" >> "$LOG"
  timeout -k 60 "$max" "$@" >> "$LOG" 2>&1
  echo "=== $(date +%T) rc=$? $label" >> "$LOG"
}

# 1. GOP-6 RD eval with the retrained video fts + deep intra (fp32+bf16)
run_step 5400 "gop6 v2 RD eval (fp32+bf16)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only \
    --steps-intra 4000 --steps-base 480 --steps-ft "$FT_STEP" \
    --frames 12 --gop 6 --eval-size 256 --modes fp32 bf16 \
    --report-name rd_report_v2.json

# 2. trained-weights bench + tier stats (VERDICT #2 acceptance)
run_step 3600 "trained bench + tier stats" \
  python bench.py --ckpt "runs/rd2/video_l0p01_ft_step${FT_STEP}.npz" \
    --video synthetic --tier-stats

# 3. random-init reference number (same content, cache-hit)
run_step 2400 "random-init bench (synthetic video)" \
  python bench.py --video synthetic

# 4. int8 e2e, trained + random (VERDICT #3)
run_step 3600 "int8_packed bench (trained ckpt)" \
  python bench.py --mode int8_packed \
    --ckpt "runs/rd2/video_l0p01_ft_step${FT_STEP}.npz" --video synthetic
run_step 3600 "int8_packed bench (random init)" \
  python bench.py --mode int8_packed --video synthetic

# 5. estimated-vs-real bpp gap on the trained models (VERDICT #7)
run_step 3600 "estimated-bpp gop6 eval (bf16)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only --estimated \
    --steps-intra 4000 --steps-base 480 --steps-ft "$FT_STEP" \
    --frames 12 --gop 6 --eval-size 256 --modes bf16 \
    --report-name rd_report_v2_estimated.json

# 6. reference-scale eval: 96f 1080p GOP32, 4 rate points, real streams
#    (fresh fixture; per-phase dirs per ADVICE r4 so stale results can
#    never blend into the merge)
run_step 600 "ref-scale fixture (96f 1080p YUV + config)" \
  python tools/ref_scale_eval.py --out runs/ref_scale5
for i in 0 1 2 3; do
  lam="$(echo 0p003 0p01 0p03 0p09 | cut -d' ' -f$((i + 1)))"
  run_step 3600 "ref-scale rate point l$lam (96f 1080p GOP32)" \
    python test.py --test_config runs/ref_scale5/config.json \
      --i_frame_model_path "runs/rd2/intra_l${lam}_step4000.npz" \
      --model_path "runs/rd2/video_l${lam}_ft_step${FT_STEP}.npz" \
      --write_stream 1 --precision bf16 --ratios x2 --worker 1 \
      --stream_path "runs/ref_scale5/bins_p$i" \
      --output_path "runs/ref_scale5/out_p$i"
done
if ls runs/ref_scale5/out_p*/x2_FL.json > /dev/null 2>&1; then
  run_step 300 "ref-scale merge" \
    python tools/ref_scale_merge.py runs/ref_scale5/out_p* \
      --out runs/ref_scale5/out
fi

# 7. int8 RD eval (per-point int8-vs-bf16 deltas)
run_step 5400 "int8 RD eval (bf16 vs int8)" \
  python tools/rd_experiment.py --out runs/rd2 --eval-only \
    --steps-intra 4000 --steps-base 480 --steps-ft "$FT_STEP" \
    --frames 12 --gop 6 --eval-size 256 --modes bf16 int8 \
    --report-name rd_report_v2_int8.json

# 8. batch-2 aggregate + kernel A/Bs (VERDICT #6)
run_step 2400 "batch-2 staged aggregate fps" \
  python bench.py --batch 2 --staged
run_step 2400 "warp packed-out boundary A/B" \
  python tools/warp_overhead_bench.py pack_after packed_out \
    grouped_pack_after grouped_packed_out
run_step 2400 "full-model packed-ctx A/B (LSSVC_PACKED_CTX=1)" \
  env LSSVC_PACKED_CTX=1 python bench.py --video synthetic
echo "=== $(date +%T) eval queue done" >> "$LOG"
