#!/bin/bash
# Dev-window measurements (runs while queue_r5 holds on runs/HOLD_r5):
# 1. bench baseline (n_bands=1) with the bf16 hand-off
# 2. bench with banded one-hot (4 bands, then 2)
# Removes the HOLD when done so the queue proceeds.
cd /root/repo || exit 1
L=runs/devwin_r5.log
echo "devwin start $(date -u)" >> $L
for B in 1 4 2; do
  echo "--- bench CSMPN_ONEHOT_BANDS=$B" >> $L
  CSMPN_ONEHOT_BANDS=$B timeout 900 python bench.py >> $L 2>&1
done
echo "devwin done $(date -u)" >> $L
rm -f runs/HOLD_r5
