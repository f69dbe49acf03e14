#!/bin/bash
# Round-5 near-miss seed extensions: the tuned probe's three closest cells
# (SHAN/Office -0.0006, TLSAN/Toys -0.0015, TLSAN/Office -0.0017) get 8
# ADDITIONAL seed draws at their best already-chosen protocol (no new
# protocol search — same legs, wider envelope, reported as n=16).
set -u
cd /root/repo
S="555 777 888 1001 2025 3141 2718 1618"
L7="0.699999988079071"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" --seeds $S "$@" > "${out%.json}.log" 2>&1; }
run runs/r5/fanout_Office_Products_shan8_ep80_ext.json \
  --model shan --dataset Office_Products --max_epochs 80 \
  --lr_scales 1.5 1.5 1.5 1.5 1.5 1.5 1.5 1.5
run runs/r5/fanout_Toys_and_Games_tlsan8_ep40_ext.json \
  --model tlsan --dataset Toys_and_Games --max_epochs 40 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
run runs/r5/fanout_Office_Products_tlsan8_do0.3_ext.json \
  --model tlsan --dataset Office_Products --max_epochs 20 --dropout 0.3 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
echo EXT_DONE
