#!/bin/bash
# Round-5 tail window, runs after queue_r5b prints "queue done":
#   1. MD17 ethanol continuation to the FULL 150k reference budget under
#      --trainer.device_data=True: the whole stacked dataset lives in
#      HBM and only (128,100) int32 index blocks ship per dispatch, so
#      the relay client's per-dispatched-byte host leak (the reason
#      every earlier long run needed 40GB-RSS stop/resume segments)
#      stays near zero — watch train/host_rss_gb in the log.
#   2. banded-one-hot A/B back-to-back in ONE measurement window (the
#      devwin attempt only yielded the bands=4 point; single points are
#      meaningless at the tunnel's ~3x HBM-bound variance).
#   3. MD17 aspirin continuation with device_data for whatever time
#      remains.
# Usage: queue_r5c.sh <HARD_STOP epoch-seconds>  (same arg as queue_r5b)
HARD_STOP=$1
cd /root/repo || exit 1
Q=runs/queue_r5c.log
log() { echo "queue_r5c: $* at $(date -u)" >> "$Q"; }
remain() { echo $(( HARD_STOP - $(date +%s) )); }
maxt() { local b=$1; [ "$b" -lt 600 ] && b=600
  printf "%d:%02d:00" $(( b / 3600 )) $(( (b % 3600) / 60 )); }
ckpt() { ls -dt runs/*"$1"*/last 2>/dev/null | head -1; }

log "waiting for queue_r5b to finish"
while ! grep -q "queue done" runs/queue_r5b.log 2>/dev/null; do
  if [ "$(remain)" -lt 120 ]; then log "hard stop while waiting; exit"; exit 0; fi
  sleep 60
done
log "queue_r5b done; tail window = $(remain)s"

run_tail() {  # $1=label $2=est_s  rest=cmd
  local LABEL=$1 EST=$2; shift 2
  if [ "$(remain)" -lt $(( EST + 120 )) ]; then
    log "$LABEL skipped (remain $(remain)s < est ${EST}s)"; return
  fi
  log "$LABEL start"
  timeout $(( EST + 120 )) "$@" > "runs/ab_${LABEL}.log" 2>&1
  log "$LABEL done (rc=$?)"
}

MD17_DEV=( python -m csmpn_tpu.tasks.md17
  --trainer.module=csmpn_tpu.engineer.Trainer
  --trainer.max_steps=150000 --trainer.val_check_interval=512
  --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=20
  --trainer.print_interval=512 --trainer.device_data=True
  --dataset.module=csmpn_tpu.data.md17.MD17Dataset
  --dataset.batch_size=100
  --model.module=csmpn_tpu.models.md17.MD17Model
  --model.num_layers=5 --model.num_hidden=32
  --optimizer.module=csmpn_tpu.engineer.optim.adam
  --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 )

# -- 1. ethanol -> 150k (61.4k steps @ ~23 ms + eval ~ 27 min; 45 min cap)
run_tail devdata_ethanol 2700 "${MD17_DEV[@]}" \
  --run_name=md17_ethanol_r5 \
  --dataset.molecule_type=ethanol --dataset.dis=10000 \
  --trainer.max_time="0:44:00" \
  --trainer.checkpoint="$(ckpt md17_ethanol_r5)"

# -- 2. bands A/B (env(1): VAR=x before a shell-function call is NOT
#       exported to its children)
run_tail bands1_bench 1320 env CSMPN_ONEHOT_BANDS=1 python bench.py
run_tail bands4_bench 1320 env CSMPN_ONEHOT_BANDS=4 python bench.py
run_tail bands1_perf 700 env CSMPN_ONEHOT_BANDS=1 \
  python tools/perf_breakdown.py --repeats 2 --fast
run_tail bands4_perf 700 env CSMPN_ONEHOT_BANDS=4 \
  python tools/perf_breakdown.py --repeats 2 --fast

# -- 3. aspirin push with the rest of the window
LEFT=$(( $(remain) - 300 ))
if [ "$LEFT" -gt 900 ]; then
  run_tail devdata_aspirin "$LEFT" "${MD17_DEV[@]}" \
    --run_name=md17_aspirin_r5 \
    --dataset.molecule_type=aspirin --dataset.dis=3 \
    --trainer.max_time="$(maxt $(( LEFT - 180 )))" \
    --trainer.checkpoint="$(ckpt md17_aspirin_r5)"
fi
log "tail done"
