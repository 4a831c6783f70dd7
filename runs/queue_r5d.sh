#!/bin/bash
# Round-5 final chip stage, after queue_r5c prints "tail done": partial
# reference-budget training evidence for the OTHER TWO molecules of the
# reference MD17 config (configs/md17.yaml: benzene2017 and
# malonaldehyde, both rips dis=10000), under device-resident data.
# With these, all four molecules of the reference sweep have convergence
# rows (ethanol+aspirin at the full 150k budget, these two at ~35-min
# partial budget).
# Usage: queue_r5d.sh <HARD_STOP epoch-seconds>
HARD_STOP=$1
cd /root/repo || exit 1
Q=runs/queue_r5d.log
log() { echo "queue_r5d: $* at $(date -u)" >> "$Q"; }
remain() { echo $(( HARD_STOP - $(date +%s) )); }

log "waiting for queue_r5c tail"
while ! grep -q "tail done" runs/queue_r5c.log 2>/dev/null; do
  if [ "$(remain)" -lt 120 ]; then log "hard stop while waiting; exit"; exit 0; fi
  sleep 60
done
log "queue_r5c done; window = $(remain)s"

for MOL in benzene2017 malonaldehyde; do
  if [ "$(remain)" -lt 1500 ]; then log "$MOL skipped (remain $(remain)s)"; break; fi
  log "$MOL start"
  timeout 2580 python -m csmpn_tpu.tasks.md17 \
    --run_name=md17_${MOL}_r5 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=150000 --trainer.max_time=0:38:00 \
    --trainer.val_check_interval=512 --trainer.steps_per_dispatch=128 \
    --trainer.eval_batches_per_dispatch=20 --trainer.print_interval=512 \
    --trainer.device_data=True \
    --dataset.module=csmpn_tpu.data.md17.MD17Dataset \
    --dataset.batch_size=100 --dataset.molecule_type=$MOL \
    --dataset.dis=10000 \
    --model.module=csmpn_tpu.models.md17.MD17Model \
    --model.num_layers=5 --model.num_hidden=32 \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 \
    > "runs/md17_${MOL}_r5.log" 2>&1
  log "$MOL done (rc=$?)"
done
log "r5d done"
