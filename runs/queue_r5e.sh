#!/bin/bash
# Round-5 session-2 re-run of the r5d final stage: the container reset
# wiped the r5d benzene2017/malonaldehyde runs (and all checkpoints)
# before their logs were committed, leaving RESULTS' "partial rows from
# the final stage" claim unsupported.  Re-run both molecules at a
# partial budget sized to this session's window, device-resident data.
cd /root/repo || exit 1
Q=runs/queue_r5e.log
log() { echo "queue_r5e: $* at $(date -u)" >> "$Q"; }

for MOL in benzene2017 malonaldehyde; do
  log "$MOL start"
  timeout 1440 python -m csmpn_tpu.tasks.md17 \
    --run_name=md17_${MOL}_r5 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=150000 --trainer.max_time=0:17:00 \
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
log "r5e done"
