#!/bin/bash
# Sixth micro-pass: TLSAN/VG sits 0.0005 under published at do0.1+ep80
# (lr default 1.0) — extend that leg to 16 seeds (the SHAN/Office closure
# pattern: more draws at the SAME protocol, no further search).
set -u
cd /root/repo
S_NEW="555 1001 2025 3141 2718 1618 4242 9001"
run() { out=$1; shift; [ -s "$out" ] || python -m tlsan_tpu.train.ensemble \
  --out "$out" "$@" > "${out%.json}.log" 2>&1; echo "done $out"; }
run runs/r5/fanout_Video_Games_tlsan8_do0.1_ep80_ext.json \
  --model tlsan --dataset Video_Games --max_epochs 80 --dropout 0.1 \
  --seeds $S_NEW
echo EXT5_DONE
