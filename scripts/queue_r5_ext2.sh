#!/bin/bash
# Round-5 third-pass probe for the remaining closest below-published cells:
#   1. Bi-LSTM/Office: 8 MORE seed draws at the PLAIN published protocol
#      (default envelope max 0.8616 sits 0.0012 under published 0.8628 —
#      no tuning involved; written as the matrix cell's _ext so
#      matrix_summary merges it into the default 16-seed envelope)
#   2. CSAN/Office: 120-epoch envelope (the DM/CSAN precedent: the default
#      20-epoch budget leaves the curve still climbing)
#   3. TLSAN/Toys + TLSAN/Office: combined-axis legs (dropout x ep40 at the
#      lr optimum 0.7 — the second pass swept each axis separately)
#   4. TLSAN/Video_Games: ep80 at its lr optimum 1.0 (ep40 still climbing?)
#   5. Bi-LSTM/Toys: single-seed 8-scale lr sweep (never probed)
set -u
cd /root/repo
S_NEW="555 1001 2025 3141 2718 1618 4242 9001"
L7="0.7"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }

run runs/r3/fanout_Office_Products_bilstm8_ext.json \
  --model bilstm --dataset Office_Products --max_epochs 20 \
  --lr_drop_step 270000 --seeds $S_NEW
run runs/r5/fanout_Office_Products_csan8_ep120.json \
  --model csan --dataset Office_Products --max_epochs 120 --lr_drop_step 270000
run runs/r5/fanout_Toys_and_Games_tlsan8_do0.1_ep40.json \
  --model tlsan --dataset Toys_and_Games --max_epochs 40 --dropout 0.1 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
run runs/r5/fanout_Office_Products_tlsan8_do0.3_ep40.json \
  --model tlsan --dataset Office_Products --max_epochs 40 --dropout 0.3 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
run runs/r5/fanout_Video_Games_tlsan8_ep80.json \
  --model tlsan --dataset Video_Games --max_epochs 80
run runs/r5/fanout_Toys_and_Games_bilstm_lr.json \
  --model bilstm --dataset Toys_and_Games --max_epochs 20 --lr_drop_step 270000 \
  --seeds 1234 1234 1234 1234 1234 1234 1234 1234 \
  --lr_scales 0.05 0.1 0.2 0.3 0.5 0.7 1.0 1.5
echo EXT2_DONE
