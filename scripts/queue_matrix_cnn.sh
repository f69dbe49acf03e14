#!/bin/bash
# CNN 8-seed envelopes on the five remaining datasets (the expensive tail of
# the family x dataset matrix; runs after queue_matrix_baselines.sh).  Same
# reference budget as the Clothing / Digital-Music CNN envelopes
# (20 epochs, lr drop 540000) on the short-window conv
# (models/cnn.py: pad to T+max_fs, exact vs the reference's fixed 500).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3

for ds in Office_Products Toys_and_Games Beauty Video_Games Home_and_Kitchen; do
  out="runs/r3/fanout_${ds}_cnn8.json"
  if [ -s "$out" ]; then echo "skip $out (exists)"; continue; fi
  python -m tlsan_tpu.train.ensemble --model cnn --dataset "$ds" \
    --max_epochs 20 --lr_drop_step 540000 \
    --out "$out" > "runs/r3/fanout_${ds}_cnn8.log" 2>&1
  tail -1 "runs/r3/fanout_${ds}_cnn8.log"
done
echo MATRIX_CNN_QUEUE_DONE
