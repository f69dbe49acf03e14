#!/bin/bash
set -u
cd "$(dirname "$0")/.."
until grep -q DM_FOLLOWUP2_DONE runs/r3/dm_followup2.log 2>/dev/null; do sleep 60; done
# SHAN's DM 8-seed spread was wide ([0.6974, 0.8053]); 8 more seeds firm
# the envelope statistics to n=16
python -m tlsan_tpu.train.ensemble --model shan --dataset Digital_Music \
  --max_epochs 40 --seeds 13 77 101 555 2718 31415 823 9000 \
  --out runs/r3/fanout_dm_shan8b.json > runs/r3/fanout_dm_shan8b.log 2>&1
tail -1 runs/r3/fanout_dm_shan8b.log
echo DM_FOLLOWUP3_DONE
