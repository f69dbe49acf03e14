#!/bin/bash
# Round-4 VERDICT #6: in-env reference anchors for the three cells that sit
# slightly below published with no measured comparator — Bi-LSTM Office
# (-0.010), Bi-LSTM Toys (-0.011), CSAN Office (-0.019).  Published protocol
# = the shipped defaults (Bi-LSTM/train.py:12-19 module constants, 20 epochs;
# CSAN/train.py:36-41 flags, 20 epochs), seed 1234, --fast top-k stubs.
# If a full run proves too slow for the round, its partial log still yields
# the matched-global-step bound (the RESULTS.md CNN methodology).  Serial:
# single-core box.  EXIT markers + .FAILED.json as in queue_ref_shan_r4.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/ref_tf

run() {
  model=$1; ds=$2
  tag="$(echo "${model}_${ds}" | tr 'A-Z-' 'a-z_')"
  log="runs/ref_tf/${tag}.log"
  if grep -q "^EXIT=0" "$log" 2>/dev/null; then echo "skip $tag (done)"; return; fi
  echo "[ref-anchor-queue] $model/$ds -> $log"
  nice -n 10 python scripts/ref_tf_run.py --model "$model" --dataset "$ds" \
      --fast > "$log" 2>&1
  rc=$?
  echo "EXIT=$rc" >> "$log"
  if [ "$rc" -ne 0 ]; then
    echo "{\"cell\": \"$model/$ds\", \"status\": \"FAILED\", \"exit\": $rc, \"log\": \"$log\"}" \
      > "runs/ref_tf/${tag}.FAILED.json"
  fi
}

run Bi-LSTM Office_Products
run CSAN Office_Products
run Bi-LSTM Toys_and_Games
echo REF_ANCHOR_QUEUE_DONE
