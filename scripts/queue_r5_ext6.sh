#!/bin/bash
# Seventh micro-pass over the remaining closest below-published cells:
#   1. CSAN/Office: the full probe methodology was never applied to this
#      cell (only the ep120 leg) — 8-scale lr sweep at the published
#      protocol, then (inspected manually) tuned legs
#   2. CSAN/Office dropout legs at default lr (CSAN is a dropout family;
#      reference CSAN/train.py dropout flag is real)
#   3. Bi-LSTM/Toys: plain-protocol seed extension (the Bi-LSTM/Office
#      closure pattern), two batches
#   4. TLSAN/VG: third seed batch at do0.1+ep80 (16-seed max 0.94536 is
#      0.0005 short)
#   5. LSPM/Clothing: 2x epoch leg at its lr optimum 0.2
set -u
cd /root/repo
S_NEW="555 1001 2025 3141 2718 1618 4242 9001"
S3="111 222 333 444 666 999 1111 2222"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }

run runs/r5/fanout_Office_Products_csan_lr.json \
  --model csan --dataset Office_Products --max_epochs 20 --lr_drop_step 270000 \
  --seeds 1234 1234 1234 1234 1234 1234 1234 1234 \
  --lr_scales 0.05 0.1 0.2 0.3 0.5 0.7 1.0 1.5
run runs/r5/fanout_Office_Products_csan8_do0.1.json \
  --model csan --dataset Office_Products --max_epochs 20 --lr_drop_step 270000 \
  --dropout 0.1
run runs/r5/fanout_Office_Products_csan8_do0.3.json \
  --model csan --dataset Office_Products --max_epochs 20 --lr_drop_step 270000 \
  --dropout 0.3
run runs/r3/fanout_Toys_and_Games_bilstm8_ext.json \
  --model bilstm --dataset Toys_and_Games --max_epochs 20 \
  --lr_drop_step 270000 --seeds $S_NEW
run runs/r3/fanout_Toys_and_Games_bilstm8_ext2.json \
  --model bilstm --dataset Toys_and_Games --max_epochs 20 \
  --lr_drop_step 270000 --seeds $S3
run runs/r5/fanout_Video_Games_tlsan8_do0.1_ep80_ext2.json \
  --model tlsan --dataset Video_Games --max_epochs 80 --dropout 0.1 \
  --seeds $S3
run runs/r5/fanout_Clothing_Shoes_and_Jewelry_lspm8_ep20.json \
  --model lspm --dataset Clothing_Shoes_and_Jewelry --max_epochs 20 \
  --lr_scales 0.2 0.2 0.2 0.2 0.2 0.2 0.2 0.2
echo EXT6_DONE
