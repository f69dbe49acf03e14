#!/bin/bash
# 8-seed shipping-code TLSAN envelopes for the five datasets that still
# had single-seed records (each at its documented best recipe from
# RESULTS.md), via the replica fan-out — one program per dataset.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3

run() {
  ds=$1; shift
  python -m tlsan_tpu.train.ensemble --model tlsan --dataset "$ds" "$@" \
    --out "runs/r3/fanout_tlsan_${ds}.json" \
    > "runs/r3/fanout_tlsan_${ds}.log" 2>&1
  tail -1 "runs/r3/fanout_tlsan_${ds}.log"
}

run Office_Products    --max_epochs 60
run Video_Games       --max_epochs 60
run Beauty            --max_epochs 40 --dropout 0.1
run Toys_and_Games    --max_epochs 40 --dropout 0.2
run Home_and_Kitchen  --max_epochs 40 --lr_drop_step 40000
echo DATASET_FANOUT_QUEUE_DONE
