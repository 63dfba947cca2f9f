#!/bin/bash
# Round-4 post-RD chip sequence.  Waits for runs/rd2/rd_report.json AND
# the rd2 driver to exit, then runs the serialized chip queue (ONE
# process on the TPU at a time):
#   1. trained-weights bench + warp-tier stats (VERDICT #3/#6 evidence)
#   2. int8_packed end-to-end 1080p bench (random init + trained)
#   3. batch-of-sequences aggregate fps (staged, batch 2) (VERDICT #4)
#   4. warp packed-out boundary A/B (tools/warp_overhead_bench.py)
#   5. int8 RD eval on the rd2 checkpoints (bf16-vs-int8 BD delta)
#   6. reference-scale eval: 96-frame 1080p, GOP 32, 4 rate points,
#      real bitstreams (VERDICT #5)
# Logs to runs/round4_chip.log.
#
# Usage: nohup bash tools/round4_chip.sh <rd2 pidfile> > /dev/null 2>&1 &
set -u
PIDFILE="${1:?rd2 driver pidfile}"
cd "$(dirname "$0")/.."
LOG=runs/round4_chip.log

while [ ! -f runs/rd2/rd_report.json ]; do sleep 120; done
pid="$(cat "$PIDFILE" 2>/dev/null || true)"
while [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; do sleep 60; done

CKPT="$(ls runs/rd2/video_l0p01_ft_step*.npz 2>/dev/null | grep -v state | tail -1)"
{
  echo "=== $(date +%T) round-4 chip queue start (ckpt=$CKPT)"
  echo "=== $(date +%T) 1a. trained-weights bench + tier stats"
  timeout 3600 python bench.py --ckpt "$CKPT" --video synthetic --tier-stats
  echo "=== $(date +%T) 1b. random-weights bench (already-known 1.583 ref point)"
  timeout 1800 python bench.py
  echo "=== $(date +%T) 2a. int8_packed bench (random init)"
  timeout 3600 python bench.py --mode int8_packed
  echo "=== $(date +%T) 2b. int8_packed bench (trained ckpt, synthetic motion)"
  timeout 3600 python bench.py --mode int8_packed --ckpt "$CKPT" --video synthetic
  echo "=== $(date +%T) 3. batch-of-sequences aggregate fps (staged, batch 2)"
  timeout 3600 python bench.py --batch 2 --staged
  echo "=== $(date +%T) 4. warp packed-out boundary A/B"
  timeout 2400 python tools/warp_overhead_bench.py pack_after packed_out grouped_pack_after grouped_packed_out
  echo "=== $(date +%T) 4b. full-model packed-ctx A/B (LSSVC_PACKED_CTX=1)"
  timeout 3600 env LSSVC_PACKED_CTX=1 python bench.py
  echo "=== $(date +%T) 5. int8 RD eval (bf16 vs int8 BD delta, rd2 ckpts)"
  timeout 5400 python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 2000 --steps-base 2400 --steps-ft 600 \
      --modes bf16 int8 --report-name rd_report_int8.json 2>&1 | tail -30
  echo "=== $(date +%T) 5b. GOP-2 diagnostic eval (error-accumulation reference)"
  timeout 3600 python tools/rd_experiment.py --out runs/rd2 --eval-only \
      --steps-intra 2000 --steps-base 2400 --steps-ft 600 --gop 2 \
      --modes bf16 --report-name rd_report_gop2.json 2>&1 | tail -12
  echo "=== $(date +%T) 6. reference-scale eval (96f 1080p GOP32, 4 rate points)"
  python tools/ref_scale_eval.py --out runs/ref_scale
  timeout 28800 python test.py --test_config runs/ref_scale/config.json \
      --i_frame_model_path runs/rd2/intra_l0p003_step2000.npz \
          runs/rd2/intra_l0p01_step2000.npz \
          runs/rd2/intra_l0p03_step2000.npz \
          runs/rd2/intra_l0p09_step2000.npz \
      --model_path runs/rd2/video_l0p003_ft_step600.npz \
          runs/rd2/video_l0p01_ft_step600.npz \
          runs/rd2/video_l0p03_ft_step600.npz \
          runs/rd2/video_l0p09_ft_step600.npz \
      --write_stream 1 --precision bf16 --ratios x2 --worker 1 \
      --stream_path runs/ref_scale/bins --output_path runs/ref_scale/out
  echo "=== $(date +%T) done"
} >> "$LOG" 2>&1
