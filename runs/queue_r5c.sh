#!/bin/bash
# Round-5 tail window: back-to-back banded-one-hot A/B (runbook item
# "bands A/B ... in the tail window").  The devwin attempt (devwin_r5.log)
# only yielded the bands=4 bench point (the bands=1 and bands=2 runs hit
# relay wedges), and single points are useless on this tunnel (HBM-bound
# variance up to ~3x between windows) — the comparison must be
# back-to-back in ONE window.
# Usage: queue_r5c.sh <HARD_STOP epoch-seconds>  (same arg as queue_r5b)
HARD_STOP=$1
cd /root/repo || exit 1
Q=runs/queue_r5c.log
log() { echo "queue_r5c: $* at $(date -u)" >> "$Q"; }
remain() { echo $(( HARD_STOP - $(date +%s) )); }

# wait for queue_r5b to finish (marker line; poll — no PID coupling so
# this survives queue relaunches)
log "waiting for queue_r5b to finish"
while ! grep -q "queue done" runs/queue_r5b.log 2>/dev/null; do
  if [ "$(remain)" -lt 120 ]; then log "hard stop while waiting; exit"; exit 0; fi
  sleep 60
done
log "queue_r5b done; tail window = $(remain)s"

run_ab() {  # $1=bands $2=label $3=est_s  rest=cmd
  local BANDS=$1 LABEL=$2 EST=$3; shift 3
  if [ "$(remain)" -lt $(( EST + 180 )) ]; then
    log "$LABEL skipped (remain $(remain)s < est ${EST}s)"; return
  fi
  log "$LABEL start (bands=$BANDS)"
  # env(1), not VAR=x func: assignments preceding a *function* call are
  # not exported to the function's children in bash
  timeout "$EST" env CSMPN_ONEHOT_BANDS="$BANDS" "$@" \
    > "runs/ab_${LABEL}.log" 2>&1
  log "$LABEL done (rc=$?)"
}

# bench pairs first (the headline metric), then the stage-level pairs
run_ab 1 bands1_bench 1200 python bench.py
run_ab 4 bands4_bench 1200 python bench.py
run_ab 1 bands1_perf 700 python tools/perf_breakdown.py --repeats 2 --fast
run_ab 4 bands4_perf 700 python tools/perf_breakdown.py --repeats 2 --fast
log "A/B done"
