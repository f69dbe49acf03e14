#!/bin/bash
# Phase 2 of the round-4 SHAN settlement (VERDICT #1): two more train seeds
# (init + shuffle; the dataset builder seed stays 1234) on each of the four
# below-published datasets, so the in-env reference anchor is a 3-seed range
# rather than a point.  Runs after queue_ref_shan_r4.sh's seed-1234 pass.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/ref_tf

for ds in Video_Games Toys_and_Games Beauty Home_and_Kitchen; do
  for seed in 42 7; do
    log="runs/ref_tf/shan_$(echo "$ds" | tr 'A-Z' 'a-z')_s${seed}.log"
    if grep -q "^EXIT=0" "$log" 2>/dev/null; then echo "skip $ds s$seed"; continue; fi
    echo "[ref-shan-seeds] $ds seed=$seed -> $log"
    nice -n 10 python scripts/ref_tf_run.py --model SHAN --dataset "$ds" \
        --fast --train_seed "$seed" > "$log" 2>&1
    rc=$?
    echo "EXIT=$rc" >> "$log"
    if [ "$rc" -ne 0 ]; then
      echo "{\"cell\": \"SHAN/$ds/s$seed\", \"status\": \"FAILED\", \"exit\": $rc}" \
        > "runs/ref_tf/shan_${ds}_s${seed}.FAILED.json"
    fi
  done
done
echo REF_SHAN_SEEDS_DONE
