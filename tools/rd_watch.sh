#!/bin/bash
# RD-experiment watchdog: relaunch tools/rd_experiment.py if its driver
# process dies before runs/rd/rd_report.json exists.  The experiment is
# resumable (stages skip on existing checkpoints), so a relaunch only
# repeats the failed stage.  Tracks the driver by PIDFILE — never by
# process-name pattern.
#
# Usage: nohup bash tools/rd_watch.sh <pidfile> [out_dir] [extra args...] \
#            >> runs/watch.log &
# Extra args are forwarded to rd_experiment.py on relaunch (step-count
# overrides change checkpoint names, so the relaunch MUST repeat them).
set -u
PIDFILE="${1:?pidfile}"
OUT="${2:-runs/rd}"
shift; [ $# -gt 0 ] && shift
cd "$(dirname "$0")/.."

while true; do
  if [ -f "$OUT/rd_report.json" ]; then
    echo "$(date +%T) report exists; watcher done"
    exit 0
  fi
  pid="$(cat "$PIDFILE" 2>/dev/null || true)"
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    echo "$(date +%T) driver (pid=${pid:-none}) gone; relaunching"
    python tools/rd_experiment.py --out "$OUT" "$@" >> runs/rd_log.txt 2>&1 &
    echo $! > "$PIDFILE"
  fi
  sleep 120
done
