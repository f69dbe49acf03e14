#!/bin/bash
set -u
cd "$(dirname "$0")/.."
python -m tlsan_tpu.train.ensemble --model lspm --dataset Digital_Music \
  --max_epochs 10 --learning_rate 0.3 \
  --out runs/r3/fanout_dm_lspm_lr03.json > runs/r3/fanout_dm_lspm_lr03.log 2>&1
tail -1 runs/r3/fanout_dm_lspm_lr03.log
python -m tlsan_tpu.train.ensemble --model csan --dataset Digital_Music \
  --max_epochs 120 --lr_drop_step 270000 \
  --out runs/r3/fanout_dm_csan120.json > runs/r3/fanout_dm_csan120.log 2>&1
tail -1 runs/r3/fanout_dm_csan120.log
echo DM_FOLLOWUP2_DONE
