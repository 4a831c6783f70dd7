#!/bin/bash
# Tail-window stage: after the evidence queue (PID $1) finishes, spend
# whatever chip time remains before HARD_STOP ($2, epoch seconds) on a
# SECOND MD17 molecule (aspirin, dis=3 — the reference's richest rips
# config, csmpn/configs/md17.yaml), bounded by trainer max_time so the
# chip is free before the round ends.
QUEUE_PID=$1
HARD_STOP=$2
cd /root/repo || exit 1
tail --pid="$QUEUE_PID" -f /dev/null
sleep 5

NOW=$(date +%s)
REMAIN=$(( HARD_STOP - NOW ))
if [ "$REMAIN" -lt 600 ]; then
  echo "queue2: ${REMAIN}s left at $(date -u) — skipping aspirin" \
    > runs/md17_aspirin_r4.log
  exit 0
fi
H=$(( REMAIN / 3600 )); M=$(( (REMAIN % 3600) / 60 ))
MAXT=$(printf "%d:%02d:00" "$H" "$M")
python -m csmpn_tpu.tasks.md17 \
  --run_name=md17_aspirin_r4 \
  --trainer.module=csmpn_tpu.engineer.Trainer \
  --trainer.max_steps=150000 --trainer.val_check_interval=128 \
  --trainer.max_time="$MAXT" \
  --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=20 \
  --trainer.print_interval=512 \
  --dataset.module=csmpn_tpu.data.md17.MD17Dataset \
  --dataset.molecule_type=aspirin --dataset.dis=3 \
  --dataset.batch_size=100 \
  --model.module=csmpn_tpu.models.md17.MD17Model \
  --model.num_layers=5 --model.num_hidden=32 \
  --optimizer.module=csmpn_tpu.engineer.optim.adam \
  --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 \
  > runs/md17_aspirin_r4.log 2>&1
