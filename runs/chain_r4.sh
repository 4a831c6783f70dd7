#!/bin/bash
# Round-4 chip-time chain: wait for the hulls full-budget run (PID $1) to
# exit, run the FULL-test-set eval from its best checkpoint, then train
# MD17 (ethanol, reference budget) until the wall-clock deadline ($2,
# epoch seconds) so the chip is free for bench.py at round end.
HULLS_PID=$1
DEADLINE=$2
cd /root/repo || exit 1
tail --pid="$HULLS_PID" -f /dev/null
sleep 5

CKPT=$(ls -d runs/*hulls_r4*/best_val_loss 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 1200 python -m csmpn_tpu.tasks.hulls \
    --run_name=hulls_r4_fulltest \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=131072 --trainer.test_only=True \
    --trainer.checkpoint="$CKPT" \
    --trainer.eval_batches_per_dispatch=64 \
    --dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset \
    --model.module=csmpn_tpu.models.hulls.HullsModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=1e-3 \
    > runs/hulls_fulltest_r4.log 2>&1
fi

NOW=$(date +%s)
REMAIN=$(( DEADLINE - NOW ))
if [ "$REMAIN" -lt 600 ]; then
  echo "chain: ${REMAIN}s left at $(date -u) — skipping md17" \
    > runs/md17_convergence_r4.log
  exit 0
fi
H=$(( REMAIN / 3600 )); M=$(( (REMAIN % 3600) / 60 ))
MAXT=$(printf "%d:%02d:00" "$H" "$M")
echo "chain: starting md17 at $(date -u), max_time=$MAXT"
python -m csmpn_tpu.tasks.md17 \
  --run_name=md17_ethanol_r4 \
  --trainer.module=csmpn_tpu.engineer.Trainer \
  --trainer.max_steps=150000 --trainer.val_check_interval=128 \
  --trainer.max_time="$MAXT" \
  --trainer.steps_per_dispatch=128 --trainer.eval_batches_per_dispatch=20 \
  --trainer.print_interval=512 \
  --dataset.module=csmpn_tpu.data.md17.MD17Dataset \
  --dataset.molecule_type=ethanol --dataset.dis=10000 \
  --dataset.batch_size=100 \
  --model.module=csmpn_tpu.models.md17.MD17Model \
  --model.num_layers=5 --model.num_hidden=32 \
  --optimizer.module=csmpn_tpu.engineer.optim.adam \
  --optimizer.lr=3e-3 --optimizer.weight_decay=1e-6 \
  > runs/md17_convergence_r4.log 2>&1
