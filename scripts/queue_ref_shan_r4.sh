#!/bin/bash
# Round-4 VERDICT #1: measure the reference's OWN SHAN code in-env on the four
# datasets where our 8-seed envelopes sit 0.07-0.20 below the published
# numbers (Video-Games -0.20, Beauty -0.09, Toys -0.09, Home-Kitchen -0.07).
# Published protocol = the shipped defaults (SHAN/train.py:27-49: SGD lr=1.0,
# b32, 40 epochs, seed 1234); --fast stubs only the P@k/R@k streaming evals
# (AUC untouched), exactly as the Office anchor run (runs/ref_tf/shan_office.log).
#
# Single-core box: runs are SERIAL in priority order (worst gap first).  Each
# log ends with EXIT=<rc>; a nonzero exit also writes a .FAILED marker so an
# interrupted queue can never silently drop a cell (VERDICT #7).  Per-epoch
# "Cost time" lines make partial runs usable as matched-step anchors.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/ref_tf

for ds in Video_Games Toys_and_Games Beauty Home_and_Kitchen; do
  log="runs/ref_tf/shan_$(echo "$ds" | tr 'A-Z' 'a-z').log"
  if grep -q "^EXIT=0" "$log" 2>/dev/null; then echo "skip $ds (done)"; continue; fi
  echo "[ref-shan-queue] $ds -> $log"
  nice -n 10 python scripts/ref_tf_run.py --model SHAN --dataset "$ds" --fast \
      > "$log" 2>&1
  rc=$?
  echo "EXIT=$rc" >> "$log"
  if [ "$rc" -ne 0 ]; then
    echo "{\"cell\": \"SHAN/$ds\", \"status\": \"FAILED\", \"exit\": $rc, \"log\": \"$log\"}" \
      > "runs/ref_tf/shan_${ds}.FAILED.json"
    echo "[ref-shan-queue] $ds FAILED rc=$rc"
  fi
done
echo REF_SHAN_QUEUE_DONE
