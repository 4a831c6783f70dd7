#!/bin/bash
# Round-5 chip queue, part B (segmented).  The relay client leaks host
# buffers proportional to dispatched bytes (the r5 ethanol run was OOM
# killed at 108k steps / 87 GB RSS), so every long run now stops itself
# at trainer.max_rss_gb, saves a latest-state checkpoint, and is
# relaunched here in a resume loop until max_steps or its stage budget.
# Usage: queue_r5b.sh <HARD_STOP epoch-seconds>
HARD_STOP=$1
cd /root/repo || exit 1
Q=runs/queue_r5b.log
log() { echo "queue_r5b: $* at $(date -u)" >> "$Q"; }
remain() { echo $(( HARD_STOP - $(date +%s) )); }

maxt() {  # $1 = seconds; prints H:MM:00
  local b=$1
  [ "$b" -lt 600 ] && b=600
  printf "%d:%02d:00" $(( b / 3600 )) $(( (b % 3600) / 60 ))
}

wait_relay() {
  while true; do
    timeout 180 python -c "
import jax, jax.numpy as jnp
print('ok', float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))
" >> "$Q" 2>&1 && { log "relay healthy"; return 0; }
    log "relay wedged; retry in 120s"
    sleep 120
  done
}

ckpt_flag() {  # $1 = run-name glob: prefer last, else best_val_loss
  local d
  d=$(ls -dt runs/*"$1"*/last 2>/dev/null | head -1)
  [ -z "$d" ] && d=$(ls -dt runs/*"$1"*/best_val_loss 2>/dev/null \
    | grep -v fulltest | head -1)
  [ -n "$d" ] && echo "--trainer.checkpoint=$d"
}

run_seg() {  # $1=run_name $2=stage_budget_s; rest = task cmd args
  local NAME=$1 BUDGET=$2; shift 2
  local T0=$(date +%s) SEG=0 FASTFAIL=0
  while true; do
    local LEFT=$(( BUDGET - ($(date +%s) - T0) ))
    local R=$(( $(remain) - 600 ))
    [ "$R" -lt "$LEFT" ] && LEFT=$R
    if [ "$LEFT" -lt 600 ]; then log "$NAME: budget exhausted"; break; fi
    SEG=$(( SEG + 1 ))
    wait_relay
    log "$NAME segment $SEG start (max_time $(maxt "$LEFT"), ckpt: $(ckpt_flag "$NAME"))"
    local S0=$(date +%s)
    # --run_name FIRST after the module: the run-dir name is the argv
    # string truncated at 96 chars (engineer/config.py get_run_name) —
    # with run_name last it was truncated away and ckpt_flag could never
    # find the checkpoints
    timeout $(( LEFT + 600 )) python "$1" "$2" \
      "--run_name=$NAME" "${@:3}" \
      --trainer.max_time="$(maxt "$LEFT")" \
      $(ckpt_flag "$NAME") \
      >> "runs/$NAME.log" 2>&1
    local RC=$?
    log "$NAME segment $SEG done (rc=$RC)"
    if grep -q "Stopping due to max_steps" "runs/$NAME.log"; then
      log "$NAME reached max_steps"; break
    fi
    # repeated fast crashes (config error, broken data) must not spin
    if [ "$RC" -ne 0 ] && [ $(( $(date +%s) - S0 )) -lt 120 ]; then
      FASTFAIL=$(( FASTFAIL + 1 ))
      if [ "$FASTFAIL" -ge 3 ]; then log "$NAME: 3 fast failures, giving up"; break; fi
    else
      FASTFAIL=0
    fi
    # rc=0 with max_time stop or max_rss stop -> loop; crash (137 OOM,
    # wedge timeout) -> loop too, resuming from the newest checkpoint
  done
}

MD17_ARGS=( -m csmpn_tpu.tasks.md17
  --trainer.module=csmpn_tpu.engineer.Trainer
  --trainer.max_steps=150000 --trainer.val_check_interval=512
  --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=20
  --trainer.print_interval=512 --trainer.max_rss_gb=40
  --dataset.module=csmpn_tpu.data.md17.MD17Dataset
  --dataset.batch_size=100
  --model.module=csmpn_tpu.models.md17.MD17Model
  --model.num_layers=5 --model.num_hidden=32
  --optimizer.module=csmpn_tpu.engineer.optim.adam
  --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 )

# ---------------- stage 2: MD17 aspirin (clique lift, dis=3) -------------
run_seg md17_aspirin_r5 8100 "${MD17_ARGS[@]}" \
  --dataset.molecule_type=aspirin --dataset.dis=3

# ---------------- stage 2b: MD17 ethanol tail (resume 108k -> 150k) ------
run_seg md17_ethanol_r5 3600 "${MD17_ARGS[@]}" \
  --dataset.molecule_type=ethanol --dataset.dis=10000

# ---------------- stage 3: hulls resume -> 131,072 -----------------------
run_seg hulls_r5 6300 -m csmpn_tpu.tasks.hulls \
  --trainer.module=csmpn_tpu.engineer.Trainer \
  --trainer.max_steps=131072 --trainer.val_check_interval=512 \
  --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=32 \
  --trainer.print_interval=512 --trainer.max_rss_gb=40 \
  --dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset \
  --model.module=csmpn_tpu.models.hulls.HullsModel \
  --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=1e-3

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

# ---------------- stage 4: NBA atk + def (10k-play stand-in) -------------
for MODE in atk def; do
  run_seg nba_${MODE}_r5 1800 -m csmpn_tpu.tasks.nba \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=10000 --trainer.val_check_interval=256 \
    --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=10 \
    --trainer.print_interval=256 --trainer.max_rss_gb=40 \
    --dataset.module=csmpn_tpu.data.nba.NBADataset \
    --dataset.mode=$MODE --dataset.dis=10000 --dataset.synth_plays=10000 \
    --model.module=csmpn_tpu.models.nba.NBAModel --model.num_layers=3 \
    --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=5e-3
done

# ---------------- stage 5: motion exact-vs-fast control ------------------
for PREC in fast exact; do
  run_seg motion_r5_$PREC 2100 -m csmpn_tpu.tasks.motion \
    --precision=$PREC \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=10000 --trainer.val_check_interval=256 \
    --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=8 \
    --trainer.print_interval=256 --trainer.max_rss_gb=40 \
    --dataset.module=csmpn_tpu.data.motion.MotionDataset \
    --model.module=csmpn_tpu.models.motion.MotionModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=5e-4 --optimizer.weight_decay=1e-4
done

# ---------------- stage 6: evidence regen --------------------------------
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
