#!/bin/bash
# Complete the published family x dataset parity matrix: 8-seed shipping-code
# envelopes for the eight baseline families on the five datasets that so far
# have only TLSAN envelopes (Office_Products, Video_Games, Beauty,
# Toys_and_Games, Home_and_Kitchen).  Per-family budgets are the same
# reference trainer defaults the Clothing / Digital-Music envelopes used
# (queue_fanout_dm_baselines.sh).  CNN runs in queue_matrix_cnn.sh (its conv
# stack is ~40x the cost of the other families even after the short-window
# rework).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3

run() {
  ds=$1; m=$2; ep=$3; shift 3
  out="runs/r3/fanout_${ds}_${m}8.json"
  if [ -s "$out" ]; then echo "skip $out (exists)"; return; fi
  python -m tlsan_tpu.train.ensemble --model "$m" --dataset "$ds" \
    --max_epochs "$ep" "$@" \
    --out "$out" > "runs/r3/fanout_${ds}_${m}8.log" 2>&1
  tail -1 "runs/r3/fanout_${ds}_${m}8.log"
}

for ds in Office_Products Video_Games Beauty Toys_and_Games Home_and_Kitchen; do
  run "$ds" bpr 20
  run "$ds" shan 40
  run "$ds" paca 70
  run "$ds" atrank 10 --lr_drop_step 270000
  run "$ds" lspm 10
  run "$ds" bilstm 20 --lr_drop_step 270000
  run "$ds" csan 20 --lr_drop_step 270000
done
echo MATRIX_BASELINE_QUEUE_DONE
