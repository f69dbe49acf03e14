#!/bin/bash
# Family-major (cheapest-family-first) ordering of the remaining published
# family x dataset matrix cells.  Same protocol as queue_matrix_baselines.sh
# (8-seed shipping-code fan-out, reference trainer budgets); reordered so a
# bounded wall-clock window completes the most cells: measured Office costs
# were lspm 4.5s < paca 45s < bilstm 132s < shan 194s < bpr 247s <
# atrank 366s < csan 443s, scaling ~linearly with dataset example count
# (Toys 1.28x, Beauty 1.85x, Video_Games 2.85x, Home_and_Kitchen 4.87x
# relative to Office).  Idempotent: skips cells whose JSON already exists.
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

DATASETS="Toys_and_Games Beauty Video_Games Home_and_Kitchen"

for ds in $DATASETS; do run "$ds" lspm 10; done
for ds in $DATASETS; do run "$ds" paca 70; done
for ds in $DATASETS; do run "$ds" bilstm 20 --lr_drop_step 270000; done
for ds in $DATASETS; do run "$ds" shan 40; done
for ds in $DATASETS; do run "$ds" bpr 20; done
for ds in $DATASETS; do run "$ds" atrank 10 --lr_drop_step 270000; done
for ds in $DATASETS; do run "$ds" csan 20 --lr_drop_step 270000; done
echo MATRIX_FAMILY_MAJOR_DONE
