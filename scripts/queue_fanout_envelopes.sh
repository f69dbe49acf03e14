#!/bin/bash
# 8-seed shipping-code envelopes for the remaining families (Clothing,
# published epoch budgets), via the replica fan-out — one program each.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r3
run() {
  m=$1; ep=$2; shift 2
  python -m tlsan_tpu.train.ensemble --model "$m" \
    --dataset Clothing_Shoes_and_Jewelry --max_epochs "$ep" "$@" \
    --out "runs/r3/fanout_${m}8.json" \
    > "runs/r3/fanout_${m}8.log" 2>&1
  tail -1 "runs/r3/fanout_${m}8.log"
}
run shan 40
run csan 20
run bilstm 20 --lr_drop_step 270000
run cnn 20 --lr_drop_step 540000
run bpr 20
run paca 70
echo FANOUT_QUEUE_DONE
