#!/bin/bash
# RD-experiment watchdog: relaunch tools/rd_experiment.py if its driver
# process dies before <out_dir>/rd_report.json exists.  The experiment is
# resumable (stages skip on existing checkpoints), so a relaunch only
# repeats the failed stage.  Tracks the driver by PIDFILE — never by
# process-name pattern.
#
# Usage: nohup bash tools/rd_watch.sh <pidfile> <out_dir> [extra args...] \
#            >> runs/watch.log &
# Extra args are forwarded to rd_experiment.py on relaunch (step-count
# overrides change checkpoint names, so the relaunch MUST repeat them).
#
# REQUIREMENT: launch the INITIAL driver with `setsid` too (relaunches
# here already are).  The deadline kill below is a process-GROUP kill; a
# non-group-leader driver would survive only via the per-pid fallbacks,
# which cannot reach an in-flight train.py stage subprocess holding the
# chip.
#
# Loop protection (round-3 lesson: a deterministic stage failure turned
# this watchdog into an infinite chip-burning retrain loop): a driver
# that dies within FAST_DEATH_S of its relaunch twice in a row is
# failing deterministically — the watcher aborts loudly instead of
# relaunching again.  MAX_RELAUNCH bounds total relaunches regardless.
set -u
PIDFILE="${1:?pidfile}"
OUT="${2:?out_dir (explicit; must not start with '-')}"
# Hard wall-clock deadline (epoch secs, env RD_DEADLINE): past it the
# watcher KILLS the driver and exits, leaving the chip idle for the
# round driver's bench/dryrun captures (round-3 lesson: a leftover
# training loop starved the host during the official artifact capture).
DEADLINE="${RD_DEADLINE:-0}"
case "$OUT" in
  -*) echo "rd_watch.sh: out_dir '$OUT' looks like a flag — pass the" \
           "out_dir explicitly before any extra args" >&2; exit 2 ;;
esac
shift 2
cd "$(dirname "$0")/.."

FAST_DEATH_S=300
MAX_RELAUNCH=6
fast_deaths=0
relaunches=0
launch_t=0

while true; do
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    pid="$(cat "$PIDFILE" 2>/dev/null || true)"
    echo "$(date +%T) RD_DEADLINE reached; killing driver (pid=${pid:-none})" \
         "and exiting"
    # drivers are launched with setsid (their own process group), so a
    # group kill also takes down the in-flight train.py stage subprocess
    if [ -n "$pid" ]; then
      kill -- "-$pid" 2>/dev/null || kill "$pid" 2>/dev/null
      sleep 10
      # escalation with a non-group fallback: if the driver wasn't a
      # group leader (externally launched without setsid), still SIGKILL
      # the pid itself rather than leaving it holding the chip
      kill -9 -- "-$pid" 2>/dev/null || kill -9 "$pid" 2>/dev/null
    fi
    exit 0
  fi
  if [ -f "$OUT/rd_report.json" ]; then
    echo "$(date +%T) report exists; watcher done"
    exit 0
  fi
  pid="$(cat "$PIDFILE" 2>/dev/null || true)"
  if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
    now=$(date +%s)
    if [ "$launch_t" -gt 0 ] && [ $((now - launch_t)) -lt "$FAST_DEATH_S" ]; then
      fast_deaths=$((fast_deaths + 1))
    else
      fast_deaths=0
    fi
    if [ "$fast_deaths" -ge 2 ]; then
      echo "$(date +%T) driver died <${FAST_DEATH_S}s after relaunch twice" \
           "in a row (deterministic failure); watcher ABORTING —" \
           "see runs/rd_log.txt" >&2
      exit 1
    fi
    if [ "$relaunches" -ge "$MAX_RELAUNCH" ]; then
      echo "$(date +%T) relaunch budget ($MAX_RELAUNCH) exhausted without" \
           "a report; watcher ABORTING" >&2
      exit 1
    fi
    echo "$(date +%T) driver (pid=${pid:-none}) gone; relaunching" \
         "($((relaunches + 1))/$MAX_RELAUNCH)"
    setsid python tools/rd_experiment.py --out "$OUT" "$@" \
        >> runs/rd_log.txt 2>&1 &
    echo $! > "$PIDFILE"
    launch_t=$now
    relaunches=$((relaunches + 1))
  fi
  sleep 120
done
