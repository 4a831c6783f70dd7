#!/bin/bash
# Chained after queue_r5 (PID $1): motion exact-vs-fast control at the
# full 10k reference budget re-run under the r5 fast path (bf16
# inter-layer hand-off landed this round) — the control that bounds the
# fast path's effect on final task metrics.  No new stage after
# HARD_STOP ($2).
QUEUE_PID=$1
HARD_STOP=$2
cd /root/repo || exit 1
tail --pid="$QUEUE_PID" -f /dev/null
sleep 5
remain() { echo $(( HARD_STOP - $(date +%s) )); }
log() { echo "queue2_r5: $* at $(date -u)" >> runs/queue2_r5.log; }

run_motion() {  # $1 = precision, $2 = timeout
  timeout "$2" python -m csmpn_tpu.tasks.motion \
    --run_name=motion_r5_$1 --precision=$1 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=10000 --trainer.val_check_interval=256 \
    --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=8 \
    --trainer.print_interval=256 \
    --dataset.module=csmpn_tpu.data.motion.MotionDataset \
    --model.module=csmpn_tpu.models.motion.MotionModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=5e-4 --optimizer.weight_decay=1e-4 \
    > runs/motion_r5_$1.log 2>&1
}

if [ "$(remain)" -gt 1200 ]; then
  log "motion fast start"; run_motion fast 2400; log "motion fast done rc=$?"
fi
if [ "$(remain)" -gt 1800 ]; then
  log "motion exact start"; run_motion exact 3000; log "motion exact done rc=$?"
fi
log done
