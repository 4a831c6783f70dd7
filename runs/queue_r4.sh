#!/bin/bash
# Evidence-regeneration queue: the container reset between round-4
# sessions wiped runs/, so every RESULTS.md-cited artifact is
# regenerated while chip time remains.  Runs after the md17 chain (PID
# $1) exits; no new stage starts after HARD_STOP ($2, epoch seconds).
CHAIN_PID=$1
HARD_STOP=$2
cd /root/repo || exit 1
tail --pid="$CHAIN_PID" -f /dev/null
sleep 5

remain() { echo $(( HARD_STOP - $(date +%s) )); }
log() { echo "queue: $* at $(date -u)" >> runs/queue_r4.log; }

# 1. >=10M-simplex streaming benchmark (BASELINE.json configs[4], mesh=1)
if [ "$(remain)" -gt 900 ]; then
  log "stream10m start"
  timeout 1500 python bench_scaling.py --simplices 10000000 --degree 8 \
    --stream 64 > runs/stream10m_r4.log 2>&1
  grep "streaming_edges_per_s" runs/stream10m_r4.log | tail -1 \
    > runs/stream10m_r4.json
fi

# 2. motion exact-vs-fast control at the full 10k reference budget
if [ "$(remain)" -gt 1800 ]; then
  log "motion exact start"
  timeout 2700 python -m csmpn_tpu.tasks.motion \
    --run_name=motion_r4_exact --precision=exact \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=10000 --trainer.val_check_interval=128 \
    --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=8 \
    --trainer.print_interval=256 \
    --dataset.module=csmpn_tpu.data.motion.MotionDataset \
    --model.module=csmpn_tpu.models.motion.MotionModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=5e-4 --optimizer.weight_decay=1e-4 \
    > runs/motion_convergence_r4_exact.log 2>&1
fi
if [ "$(remain)" -gt 900 ]; then
  log "motion fast start"
  timeout 1500 python -m csmpn_tpu.tasks.motion \
    --run_name=motion_r4_fast \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=10000 --trainer.val_check_interval=128 \
    --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=8 \
    --trainer.print_interval=256 \
    --dataset.module=csmpn_tpu.data.motion.MotionDataset \
    --model.module=csmpn_tpu.models.motion.MotionModel \
    --optimizer.module=csmpn_tpu.engineer.optim.adam \
    --optimizer.lr=5e-4 --optimizer.weight_decay=1e-4 \
    > runs/motion_convergence_r4_fast.log 2>&1
fi

# 3. NBA (atk) full budget — 800 synthetic plays for the reference bs
if [ "$(remain)" -gt 900 ]; then
  log "nba start"
  timeout 1500 python -m csmpn_tpu.tasks.nba \
    --run_name=nba_atk_r4 \
    --trainer.module=csmpn_tpu.engineer.Trainer \
    --trainer.max_steps=10000 --trainer.val_check_interval=128 \
    --trainer.steps_per_dispatch=64 --trainer.eval_batches_per_dispatch=2 \
    --trainer.print_interval=256 \
    --dataset.module=csmpn_tpu.data.nba.NBADataset \
    --dataset.mode=atk --dataset.dis=10000 --dataset.synth_plays=800 \
    --model.module=csmpn_tpu.models.nba.NBAModel --model.num_layers=3 \
    --optimizer.module=csmpn_tpu.engineer.optim.adam --optimizer.lr=5e-3 \
    > runs/nba_convergence_r4.log 2>&1
fi

# 4. roofline / MFU breakdown (exact + fast)
if [ "$(remain)" -gt 900 ]; then
  log "perf_breakdown start"
  timeout 900 python tools/perf_breakdown.py --repeats 3 \
    > runs/perf_breakdown_r4_exact.log 2>&1
  timeout 900 python tools/perf_breakdown.py --repeats 3 --fast \
    > runs/perf_breakdown_r4_fast.log 2>&1
fi

# 5. headline bench
if [ "$(remain)" -gt 120 ]; then
  log "bench start"
  timeout 900 python bench.py > runs/bench_r4.log 2>&1
fi
log "queue done"
