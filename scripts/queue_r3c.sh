#!/bin/bash
# Round-3 third TPU batch: TLSAN matched-init trainings (Home-Kitchen)
set -u
cd "$(dirname "$0")/.."
for s in 1234 42 7; do
  python scripts/tlsan_transplant.py train --train_seed $s \
    > runs/tlsan_transplant_s$s.log 2>&1
  grep -o "matched-init TLSAN (TF seed $s) best: {'auc': [0-9.]*" \
    runs/tlsan_transplant_s$s.log >> runs/r3/tlsan_transplant_summary.txt
done
echo QUEUE_R3C_DONE
