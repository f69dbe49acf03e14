#!/bin/bash
# Round-3 tail queue: the last three reference families measured in-env
# (CNN, Bi-LSTM, CSAN on Clothing, published protocol, --fast evals).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/ref_tf

for M in CNN Bi-LSTM CSAN; do
  tag=$(echo "$M" | tr -d '-' | tr 'A-Z' 'a-z')
  python scripts/ref_tf_run.py --model "$M" \
    --dataset Clothing_Shoes_and_Jewelry --fast \
    > "runs/ref_tf/${tag}_clothing_r3.log" 2>&1
  grep -io "Eval_auc: [0-9.]*" "runs/ref_tf/${tag}_clothing_r3.log" \
    | sort -k2 -n | tail -1 | sed "s/^/$M Clothing best /" \
    >> runs/ref_tf/baselines_r3.txt
done
echo "QUEUE_R3D_DONE"
