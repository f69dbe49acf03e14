#!/bin/bash
# DM follow-up probes: CSAN was still climbing at the 20-epoch budget end
# (best_step 28-32k of 32.6k) -> 60-epoch envelope; LSPM peaks early at
# lr=1.0 -> one 8-replica LR sweep, then an 8-seed envelope at the optimum
# is run manually if the sweep moves it.
set -u
cd "$(dirname "$0")/.."
until grep -q DM_BASELINE_FANOUT_QUEUE_DONE runs/r3/dm_baseline_queue.log 2>/dev/null; do sleep 60; done
python -m tlsan_tpu.train.ensemble --model csan --dataset Digital_Music \
  --max_epochs 60 --lr_drop_step 270000 \
  --out runs/r3/fanout_dm_csan60.json > runs/r3/fanout_dm_csan60.log 2>&1
tail -1 runs/r3/fanout_dm_csan60.log
python -m tlsan_tpu.train.ensemble --model lspm --dataset Digital_Music \
  --max_epochs 10 --seeds 1234 1234 1234 1234 1234 1234 1234 1234 \
  --lr_scales 0.05 0.1 0.2 0.3 0.5 0.7 1.0 1.5 \
  --out runs/r3/fanout_dm_lspm_lr.json > runs/r3/fanout_dm_lspm_lr.log 2>&1
tail -1 runs/r3/fanout_dm_lspm_lr.log
echo DM_FOLLOWUP_DONE
