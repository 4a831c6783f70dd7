#!/bin/bash
# Round-5 chip-time queue.  Priorities per VERDICT r4: MD17 FIRST (the
# only task with zero training evidence), then hulls to the full budget,
# then NBA on the 10k-play stand-in (atk AND def), then evidence regen.
# Usage: queue_r5.sh <HARD_STOP epoch-seconds>
# Wedge policy: every stage is bounded by trainer max_time (computed from
# its budget and the remaining wall clock) and orbax-checkpointed; a
# wedged stage is killed by its timeout and the next stage proceeds.
# A dev-window gate (runs/HOLD_r5) lets the builder borrow the chip
# between stages for kernel measurements (capped, auto-releases).
HARD_STOP=$1
cd /root/repo || exit 1
Q=runs/queue_r5.log
log() { echo "queue_r5: $* at $(date -u)" >> "$Q"; }
remain() { echo $(( HARD_STOP - $(date +%s) )); }

maxt() {  # $1 = budget seconds; prints H:MM:00 of min(budget, remain-300)
  local r=$(( $(remain) - 300 ))
  local b=$1
  [ "$r" -lt "$b" ] && b=$r
  [ "$b" -lt 600 ] && b=600
  printf "%d:%02d:00" $(( b / 3600 )) $(( (b % 3600) / 60 ))
}

wait_relay() {  # block until a trivial dispatch succeeds
  while true; do
    timeout 180 python -c "
import jax, jax.numpy as jnp
print('ok', float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))
" >> "$Q" 2>&1 && { log "relay healthy"; return 0; }
    log "relay wedged; retry in 120s"
    sleep 120
  done
}

dev_window() {  # honor a builder HOLD for up to 45 min
  if [ -f runs/HOLD_r5 ]; then
    log "HOLD_r5 present — dev window open"
    local t0=$(date +%s)
    while [ -f runs/HOLD_r5 ] && [ $(( $(date +%s) - t0 )) -lt 2700 ]; do
      sleep 30
    done
    rm -f runs/HOLD_r5
    log "dev window closed"
  fi
}

ckpt_flag() {  # $1 = run-name glob; prints --trainer.checkpoint=... if found
  local d
  d=$(ls -dt runs/*"$1"*/best_val_loss 2>/dev/null | head -1)
  [ -n "$d" ] && echo "--trainer.checkpoint=$d"
}

# ---------------- stage 1: MD17 ethanol (rips, dis=10000) ----------------
if [ "$(remain)" -gt 1200 ]; then
  wait_relay
  log "md17 ethanol start (max_time $(maxt 9000))"
  timeout $(( 9000 + 900 )) python -m csmpn_tpu.tasks.md17 \
    --run_name=md17_ethanol_r5 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=150000 --trainer.val_check_interval=512 \
    --trainer.max_time="$(maxt 9000)" \
    --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=20 \
    --trainer.print_interval=512 \
    $(ckpt_flag md17_ethanol_r5) \
    --dataset.module=csmpn_tpu.data.md17.MD17Dataset \
    --dataset.molecule_type=ethanol --dataset.dis=10000 \
    --dataset.batch_size=100 \
    --model.module=csmpn_tpu.models.md17.MD17Model \
    --model.num_layers=5 --model.num_hidden=32 \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 \
    > runs/md17_ethanol_r5.log 2>&1
  log "md17 ethanol done (rc=$?)"
fi

dev_window

# ---------------- stage 2: MD17 aspirin (clique lift, dis=3) -------------
if [ "$(remain)" -gt 1200 ]; then
  wait_relay
  log "md17 aspirin start (max_time $(maxt 7200))"
  timeout $(( 7200 + 900 )) python -m csmpn_tpu.tasks.md17 \
    --run_name=md17_aspirin_r5 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=150000 --trainer.val_check_interval=512 \
    --trainer.max_time="$(maxt 7200)" \
    --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=20 \
    --trainer.print_interval=512 \
    $(ckpt_flag md17_aspirin_r5) \
    --dataset.module=csmpn_tpu.data.md17.MD17Dataset \
    --dataset.molecule_type=aspirin --dataset.dis=3 \
    --dataset.batch_size=100 \
    --model.module=csmpn_tpu.models.md17.MD17Model \
    --model.num_layers=5 --model.num_hidden=32 \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 \
    > runs/md17_aspirin_r5.log 2>&1
  log "md17 aspirin done (rc=$?)"
fi

dev_window

# ---------------- stage 3: hulls resume -> 131,072 + full test -----------
if [ "$(remain)" -gt 1200 ]; then
  wait_relay
  CKPT=$(ls -dt runs/*hulls_r5*/best_val_loss 2>/dev/null | head -1)
  [ -z "$CKPT" ] && CKPT=$(ls -dt runs/*hulls_r4*/best_val_loss 2>/dev/null \
    | grep -v fulltest | head -1)
  log "hulls resume start from $CKPT (max_time $(maxt 7200))"
  timeout $(( 7200 + 900 )) python -m csmpn_tpu.tasks.hulls \
    --run_name=hulls_r5 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=131072 --trainer.val_check_interval=512 \
    --trainer.max_time="$(maxt 7200)" \
    --trainer.checkpoint="$CKPT" \
    --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=32 \
    --trainer.print_interval=512 \
    --dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset \
    --model.module=csmpn_tpu.models.hulls.HullsModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=1e-3 \
    > runs/hulls_r5.log 2>&1
  log "hulls resume done (rc=$?)"
fi

if [ "$(remain)" -gt 900 ]; then
  wait_relay
  CKPT=$(ls -dt runs/*hulls_r5*/best_val_loss 2>/dev/null | grep -v fulltest | head -1)
  [ -z "$CKPT" ] && CKPT=$(ls -dt runs/*hulls_r4*/best_val_loss 2>/dev/null \
    | grep -v fulltest | head -1)
  log "hulls full-test eval from $CKPT"
  timeout 1500 python -m csmpn_tpu.tasks.hulls \
    --run_name=hulls_r5_fulltest \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=131072 --trainer.test_only=True \
    --trainer.checkpoint="$CKPT" \
    --trainer.eval_batches_per_dispatch=64 \
    --dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset \
    --model.module=csmpn_tpu.models.hulls.HullsModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=1e-3 \
    > runs/hulls_fulltest_r5.log 2>&1
  log "hulls full-test done (rc=$?)"
fi

dev_window

# ---------------- stage 4: NBA atk + def (10k-play stand-in) -------------
for MODE in atk def; do
  if [ "$(remain)" -gt 1200 ]; then
    wait_relay
    log "nba $MODE start"
    timeout 3600 python -m csmpn_tpu.tasks.nba \
      --run_name=nba_${MODE}_r5 \
      --trainer.module=csmpn_tpu.engineer.Trainer \
      --trainer.max_steps=10000 --trainer.val_check_interval=256 \
      --trainer.max_time="$(maxt 2400)" \
      --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=10 \
      --trainer.print_interval=256 \
      --dataset.module=csmpn_tpu.data.nba.NBADataset \
      --dataset.mode=$MODE --dataset.dis=10000 --dataset.synth_plays=10000 \
      --model.module=csmpn_tpu.models.nba.NBAModel --model.num_layers=3 \
      --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=5e-3 \
      > runs/nba_${MODE}_r5.log 2>&1
    log "nba $MODE done (rc=$?)"
  fi
done

dev_window

# ---------------- stage 5: evidence regen --------------------------------
if [ "$(remain)" -gt 1800 ]; then
  wait_relay
  log "stream10m start"
  timeout 1800 python bench_scaling.py --simplices 10000000 --degree 8 \
    --stream 64 > runs/stream10m_r5.log 2>&1
  log "stream10m done (rc=$?)"
fi

if [ "$(remain)" -gt 1200 ]; then
  wait_relay
  log "perf_breakdown start"
  timeout 900 python tools/perf_breakdown.py --repeats 3 \
    > runs/perf_breakdown_r5_exact.log 2>&1
  timeout 900 python tools/perf_breakdown.py --repeats 3 --fast \
    > runs/perf_breakdown_r5_fast.log 2>&1
  log "perf_breakdown done"
fi

if [ "$(remain)" -gt 300 ]; then
  wait_relay
  log "bench start"
  timeout 1200 python bench.py > runs/bench_r5.log 2>&1
  log "bench done (rc=$?)"
fi
log "queue done"
