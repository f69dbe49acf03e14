#!/bin/bash
# Fourth micro-pass: TLSAN/Toys sits 0.0008 under published at do0.1+ep40
# (lr0.7) — extend that leg to 16 seeds, and try the do0.3 variant that
# closed TLSAN/Office.
set -u
cd /root/repo
S_NEW="555 1001 2025 3141 2718 1618 4242 9001"
L7="0.7"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }
run runs/r5/fanout_Toys_and_Games_tlsan8_do0.1_ep40_ext.json \
  --model tlsan --dataset Toys_and_Games --max_epochs 40 --dropout 0.1 \
  --seeds $S_NEW --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
run runs/r5/fanout_Toys_and_Games_tlsan8_do0.3_ep40.json \
  --model tlsan --dataset Toys_and_Games --max_epochs 40 --dropout 0.3 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
echo EXT3_DONE
