#!/bin/bash
# Ninth micro-pass: single-seed 8-scale lr sweeps for the four
# below-published cells that never got one (SHAN Beauty/HK/Toys at the
# published 40-epoch protocol, LSPM/Toys at its 10-epoch protocol) so
# EVERY below-published cell in the final matrix carries a sweep.
set -u
cd /root/repo
SW="--seeds 1234 1234 1234 1234 1234 1234 1234 1234 --lr_scales 0.05 0.1 0.2 0.3 0.5 0.7 1.0 1.5"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }
run runs/r5/fanout_Toys_and_Games_shan_lr.json \
  --model shan --dataset Toys_and_Games --max_epochs 40 $SW
run runs/r5/fanout_Beauty_shan_lr.json \
  --model shan --dataset Beauty --max_epochs 40 $SW
run runs/r5/fanout_Toys_and_Games_lspm_lr.json \
  --model lspm --dataset Toys_and_Games --max_epochs 10 $SW
run runs/r5/fanout_Home_and_Kitchen_shan_lr.json \
  --model shan --dataset Home_and_Kitchen --max_epochs 40 $SW
echo EXT8_DONE
