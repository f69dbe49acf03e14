#!/bin/bash
# 8-seed shipping-code envelopes for the eight baseline families on
# Digital-Music (published epoch budgets — the same per-model defaults the
# CLI encodes), via the replica fan-out.  Extends the family×dataset parity
# matrix beyond Clothing (BASELINE.md rows: README.md:35).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3

run() {
  m=$1; ep=$2; shift 2
  python -m tlsan_tpu.train.ensemble --model "$m" --dataset Digital_Music \
    --max_epochs "$ep" "$@" \
    --out "runs/r3/fanout_dm_${m}8.json" \
    > "runs/r3/fanout_dm_${m}8.log" 2>&1
  tail -1 "runs/r3/fanout_dm_${m}8.log"
}

run atrank 10 --lr_drop_step 270000
run shan 40
run lspm 10
run bpr 20
run bilstm 20 --lr_drop_step 270000
run csan 20 --lr_drop_step 270000
run paca 70
run cnn 20 --lr_drop_step 540000
echo DM_BASELINE_FANOUT_QUEUE_DONE
