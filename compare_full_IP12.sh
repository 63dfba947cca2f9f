#!/usr/bin/env bash
# Canned full comparison at intra period 12 — equivalent of the reference's
# compare_full_IP12.sh.
set -euo pipefail

RESULTS_DIR=${RESULTS_DIR:-output/IP12}
ANCHORS_DIR=${ANCHORS_DIR:-/root/reference/json_results}
PLOT_DIR=${PLOT_DIR:-output/plots_IP12}
mkdir -p "$PLOT_DIR"

for ratio in x2 x1_5 x3 x4; do
  echo "=============================== ratio $ratio ==============================="
  python compare_rd.py \
    --results \
      LSSVC_TPU="$RESULTS_DIR/${ratio}_FL.json" \
      SHM="$ANCHORS_DIR/hevc/IP12/${ratio}_FL.json" \
      VTM="$ANCHORS_DIR/VTM/IP12/${ratio}_FL.json" \
    --anchor SHM \
    --plot "$PLOT_DIR/${ratio}_FL.png"
done
