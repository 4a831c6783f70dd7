#!/bin/bash
# Round-5 tail window, run after queue_r5b prints "queue done":
#   1. device-resident-data demo on the chip: a short MD17 ethanol run
#      with --trainer.device_data=True.  Evidence goals: (a) host RSS
#      stays flat (the relay client's leak is proportional to dispatched
#      bytes, and this mode ships ~KB of indices per step instead of
#      ~600 KB of batch arrays), (b) s_it vs the same-day host-path
#      ethanol stage (md17_ethanol_r5.log).
#   2. banded-one-hot A/B back-to-back in ONE measurement window (the
#      devwin attempt only yielded the bands=4 bench point; single
#      points are useless at the tunnel's ~3x HBM variance).
# Usage: queue_r5c.sh <HARD_STOP epoch-seconds>  (same arg as queue_r5b)
HARD_STOP=$1
cd /root/repo || exit 1
Q=runs/queue_r5c.log
log() { echo "queue_r5c: $* at $(date -u)" >> "$Q"; }
remain() { echo $(( HARD_STOP - $(date +%s) )); }

log "waiting for queue_r5b to finish"
while ! grep -q "queue done" runs/queue_r5b.log 2>/dev/null; do
  if [ "$(remain)" -lt 120 ]; then log "hard stop while waiting; exit"; exit 0; fi
  sleep 60
done
log "queue_r5b done; tail window = $(remain)s"

run_tail() {  # $1=label $2=est_s  rest=cmd 
  local LABEL=$1 EST=$2; shift 2
  if [ "$(remain)" -lt $(( EST + 180 )) ]; then
    log "$LABEL skipped (remain $(remain)s < est ${EST}s)"; return
  fi
  log "$LABEL start"
  timeout "$EST" "$@" > "runs/ab_${LABEL}.log" 2>&1
  log "$LABEL done (rc=$?)"
}

# -- 1. device_data demo (host_rss_gb is now in every log line; compare the host-path
#       stage's 40 GB-in-28-min leak profile)
run_tail devdata_ethanol 900 python -m csmpn_tpu.tasks.md17 \
  --run_name=md17_ethanol_devdata_r5 \
  --trainer.module=csmpn_tpu.engineer.Trainer \
  --trainer.max_steps=150000 --trainer.max_time=0:11:00 \
  --trainer.val_check_interval=512 --trainer.steps_per_dispatch=128 \
  --trainer.eval_batches_per_dispatch=20 --trainer.print_interval=512 \
  --trainer.device_data=True \
  --dataset.module=csmpn_tpu.data.md17.MD17Dataset \
  --dataset.batch_size=100 --dataset.molecule_type=ethanol \
  --dataset.dis=10000 \
  --model.module=csmpn_tpu.models.md17.MD17Model \
  --model.num_layers=5 --model.num_hidden=32 \
  --optimizer.module=csmpn_tpu.engineer.optim.adam \
  --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6

# -- 2. bands A/B (env(1), not VAR=x func: assignments preceding a
#       function call are not exported to the function's children)
run_tail bands1_bench 1200 env CSMPN_ONEHOT_BANDS=1 python bench.py
run_tail bands4_bench 1200 env CSMPN_ONEHOT_BANDS=4 python bench.py
run_tail bands1_perf 700 env CSMPN_ONEHOT_BANDS=1 \
  python tools/perf_breakdown.py --repeats 2 --fast
run_tail bands4_perf 700 env CSMPN_ONEHOT_BANDS=4 \
  python tools/perf_breakdown.py --repeats 2 --fast
log "tail done"
