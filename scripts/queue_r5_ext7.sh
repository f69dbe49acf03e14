#!/bin/bash
# Eighth micro-pass: CSAN/Office with REAL dropout (the pass-7 legs were
# silent no-ops — our CSAN ignored cfg.dropout until this round's fix) plus
# the lr0.7 envelope its sweep picked.
set -u
cd /root/repo
L7="0.7"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }
run runs/r5/fanout_Office_Products_csan8_lrtuned.json \
  --model csan --dataset Office_Products --max_epochs 20 --lr_drop_step 270000 \
  --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
run runs/r5/fanout_Office_Products_csan8_do0.1.json \
  --model csan --dataset Office_Products --max_epochs 20 --lr_drop_step 270000 \
  --dropout 0.1 --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
run runs/r5/fanout_Office_Products_csan8_do0.3.json \
  --model csan --dataset Office_Products --max_epochs 20 --lr_drop_step 270000 \
  --dropout 0.3 --lr_scales $L7 $L7 $L7 $L7 $L7 $L7 $L7 $L7
echo EXT7_DONE
